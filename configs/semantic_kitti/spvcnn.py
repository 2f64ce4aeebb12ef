# SPVCNN semantic segmentation on SemanticKITTI 19-class (reference model
# `pointcept/models/sparse_unet/spconv_unet_v1m1_base.py` family /
# `spvcnn/ts_spvcnn.py`; recipe follows the SPVNAS paper's SemanticKITTI
# setup since the reference tree ships the model without a config).
_base_ = ["../_base_/default_runtime.py"]

scenes_per_device = 2
num_points_per_scene = 102400
bucket_num_points = scenes_per_device * num_points_per_scene
mix_prob = 0.0
seed = 54421566
gredient_clip = []
ignore_index = -1
num_classes = 19
feat_dim = 4

model = dict(
    type="DefaultSegmentor",
    backbone=dict(
        type="SPVCNN",
        in_channels=4,
        num_classes=num_classes,
        base_channels=32,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 2, 2, 2, 2, 2, 2, 2),
        capacity_div=(1, 2, 4, 16, 64),
        dtype="bfloat16",
    ),
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0,
             ignore_index=ignore_index),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0,
             ignore_index=ignore_index),
    ],
    loss_type="EW",
)

epoch = 50
eval_epoch = 50
optimizer = dict(type="SGD", lr=0.24, weight_decay=1e-4, momentum=0.9,
                 nesterov=True)
scheduler = dict(type="OneCycleLR", pct_start=0.04, anneal_strategy="cos",
                 div_factor=25.0, final_div_factor=100.0)
param_dicts = []

dataset_type = "SemanticKITTIDataset"
data_root = "data/semantic_kitti"

_train_transform = [
    dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=0.5),
    dict(type="RandomScale", scale=[0.9, 1.1]),
    dict(type="RandomFlip", p=0.5),
    dict(type="RandomJitter", sigma=0.005, clip=0.02),
    dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="train",
         return_grid_coord=True, keys=("coord", "strength", "segment")),
    dict(type="SphereCrop", point_max=num_points_per_scene, mode="random"),
    dict(type="Collect", keys=("coord", "grid_coord", "segment"),
         feat_keys=("coord", "strength")),
]

_val_transform = [
    dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="train",
         return_grid_coord=True, keys=("coord", "strength", "segment")),
    dict(type="Collect", keys=("coord", "grid_coord", "segment"),
         feat_keys=("coord", "strength")),
]

data = dict(
    num_classes=num_classes,
    ignore_index=ignore_index,
    names=[
        "car", "bicycle", "motorcycle", "truck", "other-vehicle", "person",
        "bicyclist", "motorcyclist", "road", "parking", "sidewalk",
        "other-ground", "building", "fence", "vegetation", "trunk",
        "terrain", "pole", "traffic-sign",
    ],
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
        split="val",
        data_root=data_root,
        transform=[],
        test_mode=True,
        test_cfg=dict(
            voxelize=dict(type="GridSample", grid_size=0.05, hash_type="fnv",
                          mode="test", keys=("coord", "strength"),
                          return_grid_coord=True),
            crop=None,
            post_transform=[
                dict(type="Collect", keys=("coord", "grid_coord", "index"),
                     feat_keys=("coord", "strength")),
            ],
            aug_transform=[
                [dict(type="RandomRotateTargetAngle", angle=[0], axis="z",
                      center=[0, 0, 0], p=1)],
            ],
        ),
    ),
)
