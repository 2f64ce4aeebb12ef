# Baseline on nuScenes lidarseg: dual-branch network WITHOUT diffusion —
# the reference's ablation ② (reference `configs/nuscenes/Baseline.py`,
# single delta `dm = False` from CDSegNet.py, `:18`).
_base_ = ["./cdsegnet.py"]

dm = False

model = dict(dm=False)
