# Stratified Transformer semantic segmentation on ScanNet 20-class
# (reference model
# `pointcept/models/stratified_transformer/stratified_transformer_v1m2_refine.py`;
# recipe follows the Stratified Transformer paper's ScanNet setup — AdamW
# lr 6e-3(?) scaled down for per-chip bs2, MultiStep — since the reference
# tree ships the model without a config).
_base_ = ["./cdsegnet.py"]

model = dict(
    _delete_=True,
    type="DefaultSegmentor",
    backbone=dict(
        type="StratifiedTransformer",
        in_channels=6,
        num_classes=20,
        channels=(48, 96, 192, 384),
        depths=(2, 2, 6, 2),
        num_heads=(3, 6, 12, 24),
        patch_size=128,
        mlp_ratio=4,
        drop_path=0.3,
        use_rpe=True,
        capacity_div=(1, 2, 4, 8, 16),
        dtype="bfloat16",
    ),
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
    ],
    loss_type="EW",
)

epoch = 600
eval_epoch = 100
optimizer = dict(_delete_=True, type="AdamW", lr=0.006, weight_decay=0.05)
scheduler = dict(_delete_=True, type="MultiStepLR",
                 milestones=[0.6, 0.8], gamma=0.1)
param_dicts = []
gredient_clip = [dict(keyword="", max_norm=1.0)]
