"""Smoke config: tiny CDSegNet on a generated synthetic ScanNet-format
dataset. Drives the full training CLI end-to-end in under a minute on CPU:

    JAX_PLATFORMS=cpu python tools/train.py \
        --config-file configs/_smoke_/cdsegnet_tiny.py \
        --options save_path=/tmp/smoke_run

The synthetic dataset is (re)generated under /tmp on config load — smoke
configs are executable Python like every other config (mmcv-style
`Config.fromfile`).
"""

import os as _os

import numpy as _np

data_root = "/tmp/cdsegnet_smoke_data"


def _generate(root, n_scenes=4, n_points=400, num_classes=5, seed=0):
    import torch as _torch

    rng = _np.random.RandomState(seed)
    for split in ("train", "val"):
        d = _os.path.join(root, split)
        _os.makedirs(d, exist_ok=True)
        for i in range(n_scenes if split == "train" else 2):
            data = dict(
                coord=rng.rand(n_points, 3).astype(_np.float32) * 3,
                color=(rng.rand(n_points, 3) * 255).astype(_np.float32),
                normal=rng.randn(n_points, 3).astype(_np.float32),
                semantic_gt20=rng.randint(
                    0, num_classes, (n_points,)
                ).astype(_np.int64),
            )
            _torch.save(data, _os.path.join(d, f"scene{i:04d}.pth"))


if not _os.path.isdir(_os.path.join(data_root, "train")):
    _generate(data_root)

save_path = "/tmp/cdsegnet_smoke_run"
seed = 0
num_devices = 1
scenes_per_device = 2
bucket_num_points = 1024
val_num_points = 512
serialization_depth = 7
mix_prob = 0.5
epoch = 1
resume = False

_backbone = dict(
    type="PT-v3m1",
    c_in_channels=6,
    n_in_channels=6,
    order=("z", "z-trans", "hilbert", "hilbert-trans"),
    c_stride=(4, 4),
    c_enc_depths=(1, 1, 1),
    c_enc_channels=(8, 16, 16),
    c_enc_num_head=(1, 2, 2),
    c_enc_patch_size=(64, 64, 64),
    c_dec_depths=(1, 1),
    c_dec_channels=(8, 8),
    c_dec_num_head=(1, 1),
    c_dec_patch_size=(64, 64),
    n_stride=(2, 2, 2, 2),
    n_enc_depths=(1, 1, 1, 1, 1),
    n_enc_channels=(8, 16, 16, 16, 16),
    n_enc_num_head=(1, 2, 2, 2, 2),
    n_enc_patch_size=(64, 64, 64, 64, 64),
    n_dec_depths=(1, 1, 1, 1),
    n_dec_channels=(8, 8, 16, 16),
    n_dec_num_head=(1, 1, 2, 2),
    n_dec_patch_size=(64, 64, 64, 64),
    mlp_ratio=2,
    drop_path=0.1,
    num_classes=5,
    T_dim=16,
    condition=True,
    skip_connection_mode="cat",
    skip_connection_scale=True,
    capacity_div=(1, 2, 4, 8, 8),
)

model = dict(
    type="DefaultSegmentorV2",
    backbone=_backbone,
    criteria=[
        dict(type="MSELoss", loss_weight=1.0),
        dict(type="CrossEntropyLoss", loss_weight=1.0),
        dict(type="LovaszLoss", loss_weight=1.0),
    ],
    loss_type="GLS",
    task_num=2,
    num_classes=5,
    T=20,
    beta_start=0,
    beta_end=1000,
    noise_schedule="cosine",
    T_dim=16,
    dm=True,
    dm_input="xt",
    dm_target="noise",
    condition=True,
    c_in_channels=6,
)

optimizer = dict(type="AdamW", lr=1e-3, weight_decay=0.01)
scheduler = dict(type="OneCycleLR", pct_start=0.3)
param_dicts = [dict(keyword="block", lr=1e-4)]

_transform = [
    dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="train",
         return_grid_coord=True),
    dict(type="NormalizeColor"),
    dict(type="Collect", keys=("coord", "grid_coord", "segment"),
         feat_keys=("color", "normal")),
]

data = dict(
    num_classes=5,
    ignore_index=-1,
    names=[f"c{i}" for i in range(5)],
    train=dict(type="ScanNetDataset", split="train", data_root=data_root,
               transform=_transform, test_mode=False),
    val=dict(type="ScanNetDataset", split="val", data_root=data_root,
             transform=_transform, test_mode=False),
)
