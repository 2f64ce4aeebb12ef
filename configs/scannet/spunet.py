# SpUNet-v1m1 semantic segmentation on ScanNet 20-class — the classic
# sparse-UNet baseline (reference `configs/scannet/semseg-spunet-v1m1-0-base.py`),
# on this repo's plain-segmentor path.
_base_ = ["./cdsegnet.py"]

model = dict(
    _delete_=True,
    type="DefaultSegmentor",
    backbone=dict(
        type="SpUNet-v1m1",
        in_channels=6,
        num_classes=20,
        base_channels=32,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
        capacity_div=(1, 2, 4, 16, 64),
    ),
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
    ],
    loss_type="EW",
)

epoch = 800
eval_epoch = 100
optimizer = dict(_delete_=True, type="SGD", lr=0.05, weight_decay=1e-4,
                 momentum=0.9, nesterov=True)
scheduler = dict(_delete_=True, type="OneCycleLR", pct_start=0.05,
                 anneal_strategy="cos", div_factor=10.0,
                 final_div_factor=10000.0)
param_dicts = []
