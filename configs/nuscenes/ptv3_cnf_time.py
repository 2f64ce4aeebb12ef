# PTv3+CNF nuScenes — TIMING protocol config (reference
# `configs/nuscenes/PTv3_CNF_time.py`): no test-time voxelization
# (grid_size=0.0001 -> one fragment per scene) and no TTA voting.
_base_ = ["./ptv3_cnf.py"]

data = dict(
    test=dict(
        test_cfg=dict(
            voxelize=dict(grid_size=0.0001),
            aug_transform=[],
        ),
    ),
)
