# PTv2 shape classification on ModelNet40 (reference wrapper
# `pointcept/models/default.py:3329-3367` DefaultClassifier; recipe follows
# the PTv2 paper's ModelNet40 setup since the reference tree ships the
# wrapper without a config).
_base_ = ["../_base_/default_runtime.py"]

scenes_per_device = 8  # shapes are tiny (~1k points after sampling)
num_points_per_scene = 1024
bucket_num_points = scenes_per_device * num_points_per_scene
mix_prob = 0.0
seed = 54421566
gredient_clip = []
ignore_index = -1
num_classes = 40
feat_dim = 3

model = dict(
    type="DefaultClassifier",
    backbone=dict(
        type="PT-v2m2",
        in_channels=3,
        num_classes=0,  # feature mode: the classifier pools backbone features
        patch_embed_channels=48,
        patch_embed_groups=6,
        enc_channels=(96, 192, 384, 512),
        enc_depths=(1, 1, 2, 1),
        enc_groups=(12, 24, 48, 64),
        dec_channels=(48, 96, 192, 384),
        dec_depths=(1, 1, 1, 1),
        dec_groups=(6, 12, 24, 48),
        k_neighbors=16,
    ),
    num_classes=num_classes,
    backbone_embed_dim=48,
    criteria=[
        # DefaultClassifier exports n_pred/n_target per scene (category
        # derived from the per-point labels), so the default keys apply
        dict(type="CrossEntropyLoss", loss_weight=1.0, label_smoothing=0.2),
    ],
    loss_type="EW",
)

epoch = 300
eval_epoch = 100
optimizer = dict(type="AdamW", lr=0.001, weight_decay=0.05)
scheduler = dict(type="CosineAnnealingLR")
param_dicts = []

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="ClsEvaluator"),
    dict(type="CheckpointSaver", save_freq=1),
]
test = dict(type="ClsTester", verbose=True)

dataset_type = "ModelNetDataset"
data_root = "data/modelnet40"

_train_transform = [
    dict(type="CenterShift", apply_z=True),
    dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=0.5),
    dict(type="RandomScale", scale=[0.9, 1.1]),
    dict(type="RandomFlip", p=0.5),
    dict(type="RandomJitter", sigma=0.005, clip=0.02),
    dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train",
         return_grid_coord=True, keys=("coord", "segment")),
    dict(type="SphereCrop", point_max=num_points_per_scene, mode="random"),
    dict(type="Collect", keys=("coord", "grid_coord", "segment", "category"),
         feat_keys=("coord",)),
]

_val_transform = [
    dict(type="CenterShift", apply_z=True),
    dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train",
         return_grid_coord=True, keys=("coord", "segment")),
    dict(type="SphereCrop", point_max=num_points_per_scene, mode="center"),
    dict(type="Collect", keys=("coord", "grid_coord", "segment", "category"),
         feat_keys=("coord",)),
]

data = dict(
    num_classes=num_classes,
    ignore_index=ignore_index,
    names=[
        "airplane", "bathtub", "bed", "bench", "bookshelf", "bottle", "bowl",
        "car", "chair", "cone", "cup", "curtain", "desk", "door", "dresser",
        "flower_pot", "glass_box", "guitar", "keyboard", "lamp", "laptop",
        "mantel", "monitor", "night_stand", "person", "piano", "plant",
        "radio", "range_hood", "sink", "sofa", "stairs", "stool", "table",
        "tent", "toilet", "tv_stand", "vase", "wardrobe", "xbox",
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
        split="test",
        data_root=data_root,
        transform=_val_transform,
        test_mode=False,
    ),
    test=dict(
        type=dataset_type,
        split="test",
        data_root=data_root,
        transform=_val_transform,
        test_mode=False,
    ),
)
