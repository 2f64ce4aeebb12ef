# PTv3+CNF on ScanNet 20-class — the lighter CNF variant the reference ships
# next to CDSegNet (reference `configs/scannet/PTv3_CNF.py`). Exactly three
# deltas from the CDSegNet recipe: last n-encoder stage depth 2 (vs 6),
# linear beta schedule 1e-4..5e-4 (vs the cosine quirk), and the reference's
# larger per-node batch (bs 2/GPU unchanged per chip here; DP scales it).
_base_ = ["./cdsegnet.py"]

beta_start = 0.0001
beta_end = 0.0005
noise_schedule = "linear"

model = dict(
    backbone=dict(n_enc_depths=(2, 2, 2, 6, 2)),
    beta_start=beta_start,
    beta_end=beta_end,
    noise_schedule=noise_schedule,
)
