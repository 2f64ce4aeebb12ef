# PTv2 (mode 2) semantic segmentation on ScanNet 20-class (reference model
# `pointcept/models/point_transformer_v2/point_transformer_v2m2_base.py`;
# recipe follows the PTv2 paper's ScanNet setup since the reference tree
# ships the model without a config).
_base_ = ["./cdsegnet.py"]

model = dict(
    _delete_=True,
    type="DefaultSegmentor",
    backbone=dict(
        type="PT-v2m2",
        in_channels=6,
        num_classes=20,
        patch_embed_channels=48,
        patch_embed_groups=6,
        enc_channels=(96, 192, 384, 512),
        enc_depths=(2, 2, 6, 2),
        enc_groups=(12, 24, 48, 64),
        dec_channels=(48, 96, 192, 384),
        dec_depths=(1, 1, 1, 1),
        dec_groups=(6, 12, 24, 48),
        k_neighbors=16,
        dtype="bfloat16",
    ),
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0,
             ignore_index=-1),
    ],
    loss_type="EW",
)

epoch = 900
eval_epoch = 100
optimizer = dict(_delete_=True, type="AdamW", lr=0.005, weight_decay=0.02)
scheduler = dict(_delete_=True, type="OneCycleLR", pct_start=0.05,
                 anneal_strategy="cos", div_factor=10.0,
                 final_div_factor=1000.0)
param_dicts = []
