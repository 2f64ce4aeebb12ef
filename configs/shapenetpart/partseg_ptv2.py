# PTv2 part segmentation on ShapeNetPart, 50 part classes in 16
# category-constrained spans (reference dataset
# `pointcept/datasets/shapenet_part.py`, tester `engines/test.py:483-591`;
# recipe follows the PTv2 paper's ShapeNetPart setup since the reference
# tree ships the model without a config).
_base_ = ["../_base_/default_runtime.py"]

scenes_per_device = 8  # shapes are tiny (~2.5k points)
num_points_per_scene = 2560
bucket_num_points = scenes_per_device * num_points_per_scene
mix_prob = 0.0
seed = 54421566
gredient_clip = []
ignore_index = -1
num_classes = 50
feat_dim = 6

model = dict(
    type="DefaultSegmentor",
    backbone=dict(
        type="PT-v2m2",
        in_channels=6,
        num_classes=num_classes,
        patch_embed_channels=48,
        patch_embed_groups=6,
        enc_channels=(96, 192, 384, 512),
        enc_depths=(2, 2, 6, 2),
        enc_groups=(12, 24, 48, 64),
        dec_channels=(48, 96, 192, 384),
        dec_depths=(1, 1, 1, 1),
        dec_groups=(6, 12, 24, 48),
        k_neighbors=16,
    ),
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0,
             ignore_index=ignore_index),
    ],
    loss_type="EW",
)

epoch = 300
eval_epoch = 100
optimizer = dict(type="AdamW", lr=0.001, weight_decay=0.05)
scheduler = dict(type="OneCycleLR", pct_start=0.05, anneal_strategy="cos",
                 div_factor=10.0, final_div_factor=1000.0)
param_dicts = []

test = dict(type="PartSegTester", verbose=True)

dataset_type = "ShapeNetPartDataset"
data_root = "data/shapenet_part"

_train_transform = [
    dict(type="CenterShift", apply_z=True),
    dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=0.5),
    dict(type="RandomScale", scale=[0.9, 1.1]),
    dict(type="RandomFlip", p=0.5),
    dict(type="RandomJitter", sigma=0.002, clip=0.01),
    dict(type="GridSample", grid_size=0.01, hash_type="fnv", mode="train",
         return_grid_coord=True, keys=("coord", "normal", "segment")),
    dict(type="SphereCrop", point_max=num_points_per_scene, mode="random"),
    dict(type="Collect", keys=("coord", "grid_coord", "segment", "category"),
         feat_keys=("coord", "normal")),
]

_val_transform = [
    dict(type="CenterShift", apply_z=True),
    dict(type="GridSample", grid_size=0.01, hash_type="fnv", mode="train",
         return_grid_coord=True, keys=("coord", "normal", "segment")),
    dict(type="Collect", keys=("coord", "grid_coord", "segment", "category"),
         feat_keys=("coord", "normal")),
]

data = dict(
    num_classes=num_classes,
    ignore_index=ignore_index,
    names=[f"part_{i}" for i in range(num_classes)],
    train=dict(
        type=dataset_type,
        split="train",
        data_root=data_root,
        transform=_train_transform,
        test_mode=False,
    ),
    val=dict(
        type=dataset_type,
        split="val",
        data_root=data_root,
        transform=_val_transform,
        test_mode=False,
    ),
    test=dict(
        type=dataset_type,
        split="test",
        data_root=data_root,
        transform=[
            dict(type="CenterShift", apply_z=True),
        ],
        test_mode=True,
        test_cfg=dict(
            voxelize=dict(type="GridSample", grid_size=0.01, hash_type="fnv",
                          mode="test", keys=("coord", "normal"),
                          return_grid_coord=True),
            crop=None,
            post_transform=[
                dict(type="Collect", keys=("coord", "grid_coord", "index"),
                     feat_keys=("coord", "normal")),
            ],
            aug_transform=[
                [dict(type="RandomRotateTargetAngle", angle=[0], axis="z",
                      center=[0, 0, 0], p=1)],
            ],
        ),
    ),
)
