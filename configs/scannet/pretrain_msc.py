# MaskedSceneContrast self-supervised pretraining on ScanNet (reference
# `configs/scannet/pretrain-msc-v1m1-0-spunet-base.py`): two augmented
# views per scene, complementary grid masks, InfoNCE + masked color/normal
# reconstruction. Pretrained backbone weights feed downstream semseg via
# the CheckpointLoader keyword remap.
_base_ = ["../_base_/default_runtime.py"]

scenes_per_device = 2
num_points_per_scene = 102400
bucket_num_points = scenes_per_device * num_points_per_scene
seed = 1
num_classes = 20  # unused by pretraining; kept for config completeness
pair_feat_keys = ("color", "normal")

model = dict(
    type="MSC",
    backbone=dict(
        type="SpUNet-v1m1",
        in_channels=6,
        num_classes=0,
        base_channels=32,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
        capacity_div=(1, 2, 4, 16, 64),
    ),
    backbone_in_channels=6,
    backbone_out_channels=96,
    mask_grid_size=0.1,
    mask_rate=0.4,
    matching_max_radius=0.03,
    matching_max_pair=8192,
    nce_t=0.4,
    contrast_weight=1.0,
    reconstruct_weight=1.0,
    reconstruct_color=True,
    reconstruct_normal=True,
)

epoch = 600
optimizer = dict(type="SGD", lr=0.1, weight_decay=1e-4, momentum=0.8,
                 nesterov=True)
scheduler = dict(type="OneCycleLR", pct_start=0.05, anneal_strategy="cos",
                 div_factor=10.0, final_div_factor=10000.0)

_view_trans = [
    dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0],
         p=0.5),
    dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="x", p=0.5),
    dict(type="RandomRotate", angle=[-1 / 64, 1 / 64], axis="y", p=0.5),
    dict(type="RandomScale", scale=[0.9, 1.1]),
    dict(type="RandomFlip", p=0.5),
    dict(type="RandomJitter", sigma=0.005, clip=0.02),
    dict(type="ChromaticAutoContrast", p=0.2, blend_factor=None),
    dict(type="ChromaticTranslation", p=0.95, ratio=0.05),
    dict(type="ChromaticJitter", p=0.95, std=0.05),
    dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train",
         keys=("coord", "color", "normal", "origin_coord"),
         return_grid_coord=True),
    dict(type="SphereCrop", point_max=num_points_per_scene, mode="random"),
    dict(type="NormalizeColor"),
]

data = dict(
    num_classes=num_classes,
    ignore_index=-1,
    train=dict(
        type="ScanNetDataset",
        split="train",
        data_root="data/scannet",
        transform=[
            dict(type="CenterShift", apply_z=True),
            dict(type="Copy", keys_dict={"coord": "origin_coord"}),
            dict(type="ContrastiveViewsGenerator",
                 view_keys=("coord", "color", "normal", "origin_coord"),
                 view_trans_cfg=_view_trans),
        ],
        test_mode=False,
    ),
)

train = dict(type="MSCTrainer")
hooks = [
    dict(type="CheckpointLoader"),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="CheckpointSaver", save_freq=1),
]
