# PointGroup instance segmentation on ScanNet (reference
# `configs/scannet/insseg-pointgroup-v1m1-0-spunet-base.py`): SpUNet
# backbone, semantic + centroid-offset losses, InstanceParser targets,
# InsSegEvaluator mAP@[.5:.95] validation.
_base_ = ["../_base_/default_runtime.py"]

scenes_per_device = 2
num_points_per_scene = 102400
bucket_num_points = scenes_per_device * num_points_per_scene
mix_prob = 0.0
seed = 1
num_classes = 20
segment_ignore_index = (-1, 0, 1)  # ignore wall/floor for instances

model = dict(
    type="PointGroup",
    backbone=dict(
        type="SpUNet-v1m1",
        in_channels=6,
        num_classes=0,
        base_channels=32,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
        capacity_div=(1, 2, 4, 16, 64),
    ),
    backbone_out_channels=96,
    num_classes=num_classes,
    cluster_radius=0.03,
    cluster_nsample=32,
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="OffsetL1Loss", loss_weight=1.0),
        dict(type="OffsetCosineLoss", loss_weight=1.0),
    ],
    loss_type="EW",
)

epoch = 800
eval_epoch = 100
optimizer = dict(type="SGD", lr=0.05, weight_decay=1e-4, momentum=0.9,
                 nesterov=True)
scheduler = dict(type="PolyLR", power=0.9)

_transform = [
    dict(type="CenterShift", apply_z=True),
    dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=0.5),
    dict(type="RandomScale", scale=[0.9, 1.1]),
    dict(type="RandomFlip", p=0.5),
    dict(type="RandomJitter", sigma=0.005, clip=0.02),
    dict(type="ChromaticAutoContrast", p=0.2, blend_factor=None),
    dict(type="ChromaticTranslation", p=0.95, ratio=0.05),
    dict(type="ChromaticJitter", p=0.95, std=0.05),
    dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train",
         return_grid_coord=True),
    dict(type="SphereCrop", point_max=num_points_per_scene, mode="random"),
    dict(type="CenterShift", apply_z=False),
    dict(type="NormalizeColor"),
    dict(type="InstanceParser", segment_ignore_index=segment_ignore_index),
    dict(type="Collect",
         keys=("coord", "grid_coord", "segment", "instance",
               "instance_centroid"),
         feat_keys=("color", "normal")),
]

data = dict(
    num_classes=num_classes,
    ignore_index=-1,
    names=[
        "wall", "floor", "cabinet", "bed", "chair", "sofa", "table", "door",
        "window", "bookshelf", "picture", "counter", "desk", "curtain",
        "refridgerator", "shower curtain", "toilet", "sink", "bathtub",
        "otherfurniture",
    ],
    train=dict(type="ScanNetDataset", split="train", data_root="data/scannet",
               transform=_transform, test_mode=False),
    val=dict(type="ScanNetDataset", split="val", data_root="data/scannet",
             transform=_transform, test_mode=False),
)

hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="InsSegEvaluator", segment_ignore_index=segment_ignore_index),
    dict(type="CheckpointSaver", save_freq=1),
]
