# Context-Aware Classifier over a SpUNet backbone on ScanNet 20-class
# (reference model
# `pointcept/models/context_aware_classifier/context_aware_classifier_v1m1_base.py`;
# loss weights main/pre/pre_self/kl mirror the reference forward `:200-244`
# as criteria `pred=` overrides — see `cdsegnet_tpu/models/cac.py`).
_base_ = ["./cdsegnet.py"]

model = dict(
    _delete_=True,
    type="CAC-v1m1",
    backbone=dict(
        type="SpUNet-v1m1",
        in_channels=6,
        num_classes=0,  # feature mode: CAC reads backbone features
        base_channels=32,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
        capacity_div=(1, 2, 4, 16, 64),
    ),
    num_classes=20,
    backbone_out_channels=96,
    cos_temp=15.0,
    criteria=[
        dict(type="CrossEntropyLoss", pred="n_pred", loss_weight=1.0,
             ignore_index=-1),
        dict(type="CrossEntropyLoss", pred="cac_pred", loss_weight=1.0,
             ignore_index=-1),
        dict(type="CrossEntropyLoss", pred="pre_pred", loss_weight=1.0,
             ignore_index=-1),
        dict(type="CACDistillLoss", pred="n_pred", soft="cac_pred",
             loss_weight=1.0),
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
