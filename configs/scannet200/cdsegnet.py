# CDSegNet on ScanNet200 (200 fine-grained classes).
# Same recipe as ScanNet-20 with the 200-class head and dataset
# (reference configs/scannet200/CDSegNet.py).
_base_ = ["../scannet/cdsegnet.py"]

num_classes = 200
dataset_type = "ScanNet200Dataset"
data_root = "data/scannet"

model = dict(
    backbone=dict(num_classes=num_classes),
    num_classes=num_classes,
)

data = dict(
    num_classes=num_classes,
    names=[f"class_{i}" for i in range(num_classes)],  # full names in meta
    train=dict(type=dataset_type),
    val=dict(type=dataset_type),
    test=dict(type=dataset_type),
)
