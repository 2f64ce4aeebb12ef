# OctFormer-v1m1 semantic segmentation on ScanNet 20-class (reference model
# `pointcept/models/octformer/octformer_v1m1_base.py`; recipe follows the
# OctFormer paper's ScanNet setup — AdamW lr 1e-3 wd 0.05, OneCycle — since
# the reference tree ships the model without a config).
_base_ = ["./cdsegnet.py"]

model = dict(
    _delete_=True,
    type="DefaultSegmentor",
    backbone=dict(
        type="OctFormer-v1m1",
        in_channels=6,
        num_classes=20,
        fpn_channels=168,
        channels=(96, 192, 384, 384),
        num_blocks=(2, 2, 18, 2),
        num_heads=(6, 12, 24, 24),
        patch_size=32,
        stem_down=2,
        head_up=2,
        dilation=4,
        drop_path=0.5,
        capacity_div=(1, 4, 8, 16, 32, 64),
        dtype="bfloat16",
    ),
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0,
             ignore_index=-1),
    ],
    loss_type="EW",
)

epoch = 600
eval_epoch = 100
optimizer = dict(_delete_=True, type="AdamW", lr=0.001, weight_decay=0.05)
scheduler = dict(_delete_=True, type="OneCycleLR", pct_start=0.05,
                 anneal_strategy="cos", div_factor=10.0,
                 final_div_factor=1000.0)
param_dicts = []
