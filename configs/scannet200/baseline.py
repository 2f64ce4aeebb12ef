# Baseline on ScanNet200: the dual-branch network WITHOUT diffusion —
# the reference's ablation ② (conditional network only; reference
# `configs/scannet200/Baseline.py`, whose single delta from CDSegNet.py
# is `dm = False`, `:22`).
_base_ = ["./cdsegnet.py"]

dm = False

model = dict(dm=False)
