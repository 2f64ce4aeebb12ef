# CDSegNet nuScenes — TIMING protocol config (reference
# `configs/nuscenes/CDSegNet_time.py:262,278`): no test-time voxelization
# (grid_size=0.0001 -> one fragment per scene) and no TTA voting.
_base_ = ["./cdsegnet.py"]

data = dict(
    test=dict(
        test_cfg=dict(
            voxelize=dict(grid_size=0.0001),
            aug_transform=[],
        ),
    ),
)
