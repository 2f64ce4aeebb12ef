# CDSegNet on ScanNet200 (200 fine-grained classes).
# Same recipe as ScanNet-20 with the 200-class head and dataset — and the
# LINEAR noise schedule this dataset uses in the reference (betas
# 0.001..0.005, reference configs/scannet200/CDSegNet.py:29-31, unlike
# ScanNet-20's cosine).
_base_ = ["../scannet/cdsegnet.py"]

num_classes = 200
dataset_type = "ScanNet200Dataset"
data_root = "data/scannet"

beta_start = 0.001
beta_end = 0.005
noise_schedule = "linear"

model = dict(
    backbone=dict(num_classes=num_classes),
    num_classes=num_classes,
    beta_start=beta_start,
    beta_end=beta_end,
    noise_schedule=noise_schedule,
)

data = dict(
    num_classes=num_classes,
    names=[f"class_{i}" for i in range(num_classes)],  # full names in meta
    train=dict(type=dataset_type),
    val=dict(type=dataset_type),
    test=dict(type=dataset_type),
)
