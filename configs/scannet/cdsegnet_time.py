# CDSegNet ScanNet — TIMING protocol config (reference
# `configs/scannet/CDSegNet_time.py:262,278`): the speed-comparison setup of
# README.md:243-248 made reproducible as a config artifact rather than CLI
# overrides. Exactly two deltas from the accuracy recipe:
#   - test GridSample grid_size=0.0001: effectively no voxelization at test
#     time, so every scene is ONE fragment (no fragment loop) — the "no
#     fragmented inference" trick;
#   - aug_transform=[]: no test-time augmentation voting.
# Run with tools/test_time.py (single chip, SSI).
_base_ = ["./cdsegnet.py"]

data = dict(
    test=dict(
        test_cfg=dict(
            voxelize=dict(grid_size=0.0001),
            aug_transform=[],
        ),
    ),
)
