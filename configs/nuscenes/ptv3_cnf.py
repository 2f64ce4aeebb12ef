# PTv3+CNF on nuScenes lidarseg — the lighter CNF variant next to CDSegNet
# (reference `configs/nuscenes/PTv3_CNF.py`). Deltas from the nuScenes
# CDSegNet recipe: last n-encoder stage depth 2 (vs 6) and linear betas in
# [0.002, 0.003] (reference `PTv3_CNF.py:25-27,75`).
_base_ = ["./cdsegnet.py"]

beta_start = 0.002
beta_end = 0.003
noise_schedule = "linear"

model = dict(
    backbone=dict(n_enc_depths=(2, 2, 2, 6, 2)),
    beta_start=beta_start,
    beta_end=beta_end,
    noise_schedule=noise_schedule,
)
