# PTv3+CNF on ScanNet200 — the lighter CNF variant next to CDSegNet
# (reference `configs/scannet200/PTv3_CNF.py`). Deltas from the ScanNet200
# CDSegNet recipe: last n-encoder stage depth 2 (vs 6;
# reference `:78`) and OneCycle pct_start 0.50 (vs 0.30; `:146`). The
# reference's larger per-node batch (bs 2/GPU unchanged) scales via DP.
_base_ = ["./cdsegnet.py"]

model = dict(
    backbone=dict(n_enc_depths=(2, 2, 2, 6, 2)),
)

scheduler = dict(pct_start=0.50)
