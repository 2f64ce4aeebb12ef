# Plain single-branch PTv3 on nuScenes lidarseg (reference
# `configs/nuscenes/PTv3.py`): the CNF config minus the diffusion wrapper —
# DefaultSegmentor over the n-branch only (condition=False, EW loss,
# skip "add"; reference `:17,34,47`).
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
