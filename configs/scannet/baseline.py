# Baseline on ScanNet-20: dual-branch network WITHOUT diffusion — the
# reference's ablation ② (conditional network only; reference
# `configs/scannet/Baseline.py`, single delta `dm = False`).
_base_ = ["./cdsegnet.py"]

dm = False

model = dict(dm=False)
