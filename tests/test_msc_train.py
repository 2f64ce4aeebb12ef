"""MaskedSceneContrast pretraining end-to-end: ContrastiveViewsGenerator ->
pair collation -> MSCTrainer one epoch with finite contrastive loss."""

import numpy as np
import pytest


@pytest.mark.slow
def test_msc_pretraining_end_to_end(tmp_path):
    from test_engine import _write_synthetic_dataset

    from cdsegnet_tpu.engine.config import Config
    from cdsegnet_tpu.engine.train import TRAINERS

    root = str(tmp_path / "data")
    _write_synthetic_dataset(root, n_scenes=4, n_points=300)
    view_trans = [
        dict(type="RandomRotate", angle=[-1 / 32, 1 / 32], axis="z", p=0.5),
        dict(type="RandomJitter", sigma=0.002, clip=0.01),
        dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="train",
             keys=("coord", "color", "normal", "origin_coord"),
             return_grid_coord=True),
        dict(type="NormalizeColor"),
    ]
    transform = [
        dict(type="CenterShift", apply_z=True),
        dict(type="Copy", keys_dict={"coord": "origin_coord"}),
        dict(type="ContrastiveViewsGenerator",
             view_keys=("coord", "color", "normal", "origin_coord"),
             view_trans_cfg=view_trans),
    ]
    cfg = Config(Config._wrap(dict(
        save_path=str(tmp_path / "exp"),
        seed=0, num_devices=1, scenes_per_device=2,
        bucket_num_points=1024, serialization_depth=7, epoch=1, resume=False,
        pair_feat_keys=("color", "normal"),
        model=dict(
            type="MSC",
            backbone=dict(type="SpUNet-v1m1", in_channels=6, num_classes=0,
                          base_channels=8,
                          channels=(8, 8, 16, 16, 16, 16, 8, 8),
                          layers=(1, 1, 1, 1, 1, 1, 1, 1),
                          capacity_div=(1, 2, 4, 8, 8)),
            backbone_in_channels=6, backbone_out_channels=8,
            matching_max_radius=0.1, matching_max_pair=256,
            mask_grid_size=0.4,
        ),
        optimizer=dict(type="AdamW", lr=1e-3, weight_decay=0.01),
        scheduler=dict(type="OneCycleLR", pct_start=0.3),
        hooks=[dict(type="IterationTimer"), dict(type="InformationWriter")],
        data=dict(
            num_classes=5, ignore_index=-1,
            train=dict(type="ScanNetDataset", split="train", data_root=root,
                       transform=transform, test_mode=False),
        ),
    )))
    tr = TRAINERS.build(dict(type="MSCTrainer"), cfg=cfg)
    p0 = np.asarray(tr.state.params["mask_token"])
    tr.train()
    assert int(tr.state.step) == tr.steps_per_epoch
    m = tr.comm_info["metrics"]
    assert np.isfinite(m["loss"]) and m["loss"] > 0
    assert "nce_loss" in m and np.isfinite(m["nce_loss"])
    # the learned mask token moved
    assert np.abs(np.asarray(tr.state.params["mask_token"]) - p0).max() > 0
