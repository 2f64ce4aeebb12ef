# PTv1 (PointTransformer-Seg50) semantic segmentation on ScanNet 20-class
# (reference model `pointcept/models/point_transformer/point_transformer_seg.py`;
# recipe follows the Point Transformer paper's ScanNet setup since the
# reference tree ships the model without a config).
_base_ = ["./cdsegnet.py"]

model = dict(
    _delete_=True,
    type="DefaultSegmentor",
    backbone=dict(
        type="PT-v1",
        in_channels=6,
        num_classes=20,
        channels=(32, 64, 128, 256, 512),
        depths=(1, 2, 3, 5, 2),  # Seg50
        share_planes=8,
        nsample=(8, 16, 16, 16, 16),
        stride=4,
        capacity_div=(1, 4, 16, 64, 256),
        dtype="bfloat16",
    ),
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
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
