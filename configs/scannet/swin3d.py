# Swin3D-v1m1 on ScanNet (reference `configs/scannet/semseg-swin3d-v1m1-0-small.py`):
# cRSE window attention over serialized patches. Feat layout is
# color(3)+normal(3) to feed the XYZ_RGB_NORM signal tables.
_base_ = ["./cdsegnet.py"]

model = dict(
    _delete_=True,
    type="DefaultSegmentor",
    backbone=dict(
        type="Swin3D-v1m1",
        in_channels=6,
        num_classes=20,
        base_grid_size=0.02,
        depths=(2, 4, 9, 4, 4),
        channels=(48, 96, 192, 384, 384),
        num_heads=(6, 6, 12, 24, 24),
        window_sizes=(5, 7, 7, 7, 7),
        quant_size=4,
        drop_path_rate=0.3,
        cRSE="XYZ_RGB_NORM",
        color_slice=(0, 3),
        normal_slice=(3, 6),
        patch_size=64,
        capacity_div=(1, 2, 4, 16, 64),
    ),
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
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
