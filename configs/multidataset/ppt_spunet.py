# Point Prompt Training: joint ScanNet + S3DIS (+ Structured3D) training
# with a PDNorm SpUNet backbone and the language-guided head, mirroring the
# reference recipe family `semseg-ppt-v1m1-*` (Pointcept
# `point_prompt_training_v1m1_language_guided.py`).
#
# Each ConcatDataset entry carries `condition` (its name in the model's
# `conditions` tuple) and `loop` (its round-robin ratio); the trainer
# compiles one train step per condition (static head widths / PDNorm
# selection) and dispatches by the loader's `_dataset_idx` tag.
_base_ = ["../_base_/default_runtime.py"]

scenes_per_device = 2
num_points_per_scene = 102400
bucket_num_points = scenes_per_device * num_points_per_scene
mix_prob = 0.0
seed = 1
num_classes = 20  # evaluator uses the val dataset's space (ScanNet)
ignore_index = -1

conditions = ("Structured3D", "ScanNet", "S3DIS")

model = dict(
    type="PPT-v1m1",
    backbone=dict(
        type="SpUNet-v1m3",
        in_channels=6,
        num_classes=0,  # feature mode; PPT owns the head
        base_channels=32,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
        num_conditions=len(conditions),
        pdnorm_adaptive=True,
        capacity_div=(1, 2, 4, 16, 64),
    ),
    backbone_out_channels=96,
    context_channels=256,
    conditions=conditions,
    # export CLIP ViT-B/16 text embeddings of DEFAULT_CLASS_NAMES offline to
    # .npy and point class_embedding_path at it; unset -> learned table
    class_embedding_path=None,
    clip_embed_dim=512,
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0,
             ignore_index=ignore_index),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0,
             ignore_index=ignore_index),
    ],
    loss_type="EW",
)

epoch = 100
optimizer = dict(type="AdamW", lr=0.0008, weight_decay=0.05)
scheduler = dict(
    type="OneCycleLR", pct_start=0.05, anneal_strategy="cos",
    div_factor=10.0, final_div_factor=1000.0,
)

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
    dict(type="Collect", keys=("coord", "grid_coord", "segment"),
         feat_keys=("color", "normal")),
]

data = dict(
    num_classes=num_classes,
    ignore_index=ignore_index,
    train=dict(
        type="ConcatDataset",
        datasets=[
            dict(type="Structured3DDataset", split="train",
                 data_root="data/structured3d", transform=_transform,
                 test_mode=False, condition="Structured3D", loop=2),
            dict(type="ScanNetDataset", split="train",
                 data_root="data/scannet", transform=_transform,
                 test_mode=False, condition="ScanNet", loop=1),
            dict(type="S3DISDataset", split=("Area_1", "Area_2", "Area_3",
                                             "Area_4", "Area_6"),
                 data_root="data/s3dis", transform=_transform,
                 test_mode=False, condition="S3DIS", loop=1),
        ],
    ),
)

train = dict(type="MultiDatasetTrainer")
hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="CheckpointSaver", save_freq=1),
]
