# Plain single-branch PTv3 on ScanNet (reference
# `configs/scannet/semseg-pt-v3m1-0-base.py`): the CNF config minus the
# diffusion wrapper — DefaultSegmentor over the n-branch only.
_base_ = ["./cdsegnet.py"]

condition = False
dm = False

model = dict(
    type="DefaultSegmentor",
    backbone=dict(
        condition=False,
        T_dim=-1,
    ),
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0,
             ignore_index=-1),
    ],
    loss_type="EW",
)
