# OA-CNNs semantic segmentation on ScanNet 20-class (reference model
# `pointcept/models/oacnns/oacnns_v1m1_base.py`; recipe follows the OA-CNNs
# paper's ScanNet setup since the reference tree ships the model without a
# config).
_base_ = ["./cdsegnet.py"]

model = dict(
    _delete_=True,
    type="DefaultSegmentor",
    backbone=dict(
        type="OACNNs",
        in_channels=6,
        num_classes=20,
        embed_channels=64,
        enc_channels=(64, 64, 128, 256),
        enc_depth=(3, 3, 9, 8),
        dec_channels=(96, 96, 128, 256),
        point_grid_size=((16, 32, 64), (8, 16, 24), (4, 8, 12), (2, 4, 6)),
        capacity_div=(1, 2, 4, 16, 64),
        dtype="bfloat16",
    ),
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0,
             ignore_index=-1),
    ],
    loss_type="EW",
)

epoch = 800
eval_epoch = 100
optimizer = dict(_delete_=True, type="AdamW", lr=0.001, weight_decay=0.02)
scheduler = dict(_delete_=True, type="OneCycleLR", pct_start=0.04,
                 anneal_strategy="cos", div_factor=10.0,
                 final_div_factor=1000.0)
param_dicts = []
