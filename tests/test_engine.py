"""Engine integration: config system, trainer loop, checkpointing, tester."""

import os
import sys

import numpy as np
import pytest

from cdsegnet_tpu.engine.config import Config, parse_options


def _write_synthetic_dataset(root, n_scenes=4, n_points=400, num_classes=5, seed=0):
    import torch

    rng = np.random.RandomState(seed)
    for split in ("train", "val"):
        os.makedirs(os.path.join(root, split), exist_ok=True)
        for i in range(n_scenes if split == "train" else 2):
            coord = rng.rand(n_points, 3).astype(np.float32) * 3
            data = dict(
                coord=coord,
                color=(rng.rand(n_points, 3) * 255).astype(np.float32),
                normal=rng.randn(n_points, 3).astype(np.float32),
                semantic_gt20=rng.randint(0, num_classes, (n_points,)).astype(np.int64),
            )
            torch.save(data, os.path.join(root, split, f"scene{i:04d}.pth"))


def test_config_base_inheritance(tmp_path):
    base = tmp_path / "base.py"
    base.write_text("a = 1\nd = dict(x=1, y=2)\n")
    child = tmp_path / "child.py"
    child.write_text("_base_ = ['base.py']\na = 2\nd = dict(y=3, z=4)\n")
    cfg = Config.fromfile(str(child))
    assert cfg.a == 2
    assert cfg.d.x == 1 and cfg.d.y == 3 and cfg.d.z == 4
    cfg.merge_from_dict(parse_options(["d.x=9", "name=foo"]))
    assert cfg.d.x == 9 and cfg.name == "foo"


def test_shipped_configs_load():
    """Every shipped recipe config loads, its model (and criteria, when
    config-side) builds, and dataset/model class counts agree."""
    import glob

    from cdsegnet_tpu.models.builder import build_model
    from cdsegnet_tpu.models.losses import build_criteria

    files = sorted(
        f for f in glob.glob("configs/**/*.py", recursive=True)
        if "/_base_/" not in f
    )
    assert len(files) >= 15
    for f in files:
        cfg = Config.fromfile(f)
        assert "type" in cfg.model, f
        model = build_model(dict(cfg.model))
        assert model is not None, f
        if cfg.model.get("criteria"):
            build_criteria(
                [dict(c) for c in cfg.model.criteria],
                loss_type=cfg.model.get("loss_type", "EW"),
                task_num=cfg.model.get("task_num", 2),
            )
        if "num_classes" in cfg.model and cfg.get("data"):
            assert cfg.data.num_classes == cfg.model.num_classes, f

    # flagship spot checks
    cfg = Config.fromfile("configs/scannet/cdsegnet.py")
    assert cfg.model.type == "DefaultSegmentorV2"
    assert cfg.model.backbone.type == "PT-v3m1"
    cnf = Config.fromfile("configs/scannet/ptv3_cnf.py")
    assert tuple(cnf.model.backbone.n_enc_depths) == (2, 2, 2, 6, 2)
    assert cnf.model.noise_schedule == "linear"
    assert cnf.model.beta_end == 0.0005
    ncnf = Config.fromfile("configs/nuscenes/ptv3_cnf.py")
    assert tuple(ncnf.model.backbone.n_enc_depths) == (2, 2, 2, 6, 2)
    assert (ncnf.model.beta_start, ncnf.model.beta_end) == (0.002, 0.003)
    # timing-protocol configs (reference CDSegNet_time.py:262,278): one
    # fragment per scene + no TTA, everything else inherited unchanged
    for f in (
        "configs/scannet/cdsegnet_time.py",
        "configs/scannet/ptv3_cnf_time.py",
        "configs/nuscenes/cdsegnet_time.py",
        "configs/nuscenes/ptv3_cnf_time.py",
    ):
        t = Config.fromfile(f)
        assert t.data.test.test_cfg.voxelize.grid_size == 0.0001, f
        assert t.data.test.test_cfg.aug_transform == [], f
        assert t.model.backbone.type == "PT-v3m1", f
    # Baseline = CDSegNet minus diffusion (reference Baseline.py: dm=False);
    # ScanNet200 trains the LINEAR schedule (reference scannet200/
    # CDSegNet.py:29-31), unlike ScanNet-20's cosine
    for f in ("configs/scannet/baseline.py", "configs/scannet200/baseline.py",
              "configs/nuscenes/baseline.py"):
        b = Config.fromfile(f)
        assert b.model.dm is False, f
        assert b.model.type == "DefaultSegmentorV2", f
    s200 = Config.fromfile("configs/scannet200/cdsegnet.py")
    assert s200.model.noise_schedule == "linear"
    assert (s200.model.beta_start, s200.model.beta_end) == (0.001, 0.005)
    s200cnf = Config.fromfile("configs/scannet200/ptv3_cnf.py")
    assert tuple(s200cnf.model.backbone.n_enc_depths) == (2, 2, 2, 6, 2)
    assert s200cnf.scheduler.pct_start == 0.50
    nplain = Config.fromfile("configs/nuscenes/ptv3_plain.py")
    assert nplain.model.type == "DefaultSegmentor"
    assert nplain.model.loss_type == "EW"


@pytest.mark.slow
def test_trainer_end_to_end(tmp_path):
    """2 epochs on a synthetic dataset: loss decreases machinery-wise, val
    evaluator runs, checkpoints save and resume."""
    from test_model import TINY_BACKBONE

    root = str(tmp_path / "data")
    _write_synthetic_dataset(root)
    save = str(tmp_path / "exp")
    transform = [
        dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="train",
             return_grid_coord=True),
        dict(type="NormalizeColor"),
        dict(type="Collect", keys=("coord", "grid_coord", "segment"),
             feat_keys=("color", "normal")),
    ]
    cfg = Config(Config._wrap(dict(
        save_path=save,
        seed=0,
        num_devices=1,
        scenes_per_device=2,
        bucket_num_points=1024,
        val_num_points=512,
        serialization_depth=7,
        mix_prob=0.5,
        epoch=2,
        resume=False,
        model=dict(
            type="DefaultSegmentorV2",
            backbone=dict(TINY_BACKBONE),
            criteria=[
                dict(type="MSELoss", loss_weight=1.0),
                dict(type="CrossEntropyLoss", loss_weight=1.0),
                dict(type="LovaszLoss", loss_weight=1.0),
            ],
            loss_type="GLS", task_num=2, num_classes=5, T=20,
            beta_start=0, beta_end=1000, noise_schedule="cosine", T_dim=16,
            dm=True, dm_input="xt", dm_target="noise", condition=True,
            c_in_channels=6,
        ),
        optimizer=dict(type="AdamW", lr=1e-3, weight_decay=0.01),
        scheduler=dict(type="OneCycleLR", pct_start=0.3),
        param_dicts=[dict(keyword="block", lr=1e-4)],
        data=dict(
            num_classes=5,
            ignore_index=-1,
            names=[f"c{i}" for i in range(5)],
            train=dict(type="ScanNetDataset", split="train", data_root=root,
                       transform=transform, test_mode=False),
            val=dict(type="ScanNetDataset", split="val", data_root=root,
                     transform=transform, test_mode=False),
        ),
    )))
    from cdsegnet_tpu.engine.train import Trainer

    tr = Trainer(cfg)
    tr.train()
    assert int(tr.state.step) == tr.steps_per_epoch * 2
    assert tr.ckpt_manager.has("model_last")
    assert tr.ckpt_manager.has("model_best")
    assert "current_metric_value" in tr.comm_info  # evaluator ran
    # resume restores the step counter
    cfg2 = cfg.copy()
    cfg2["resume"] = True
    tr2 = Trainer(cfg2)
    restored = tr2.ckpt_manager.restore(tr2.state, "model_last")
    assert restored is not None
    assert int(restored.step) == int(tr.state.step)


@pytest.mark.slow
def test_tta_tester_end_to_end(tmp_path):
    """SemSegTester: TTA fragments -> vote accumulation -> mIoU + submission."""
    import jax

    from cdsegnet_tpu.engine.state import TrainState
    from cdsegnet_tpu.engine.test import SemSegTester
    from cdsegnet_tpu.models.builder import build_model
    from cdsegnet_tpu.models.structure import make_point_batch
    from test_model import TINY_MODEL, RNGS

    import jax.numpy as jnp
    import optax

    root = str(tmp_path / "data")
    _write_synthetic_dataset(root, n_scenes=2, n_points=300)
    save = str(tmp_path / "exp")
    cfg = Config(Config._wrap(dict(
        save_path=save,
        seed=0,
        serialization_depth=7,
        submission=True,
        test_buckets=[256, 512],
        ignore_index=-1,
        model=TINY_MODEL,
        data=dict(
            num_classes=5,
            ignore_index=-1,
            names=[f"c{i}" for i in range(5)],
            test=dict(
                type="ScanNetDataset", split="val", data_root=root,
                transform=[dict(type="CenterShift", apply_z=True),
                           dict(type="NormalizeColor")],
                test_mode=True,
                test_cfg=dict(
                    voxelize=dict(type="GridSample", grid_size=0.1,
                                  hash_type="fnv", mode="test",
                                  keys=("coord", "color", "normal"),
                                  return_grid_coord=True),
                    crop=None,
                    post_transform=[
                        dict(type="CenterShift", apply_z=False),
                        dict(type="Collect", keys=("coord", "grid_coord", "index"),
                             feat_keys=("color", "normal")),
                    ],
                    aug_transform=[
                        [dict(type="RandomRotateTargetAngle", angle=[0], axis="z",
                              center=[0, 0, 0], p=1)],
                        [dict(type="RandomFlip", p=1)],
                    ],
                ),
            ),
        ),
    )))
    model = build_model(dict(TINY_MODEL))
    n = 512
    point = make_point_batch(
        coord=jnp.zeros((n, 3)), feat=jnp.zeros((n, 6)),
        grid_coord=jnp.zeros((n, 3), jnp.int32),
        batch=jnp.zeros((n,), jnp.int32),
        mask=jnp.zeros((n,), bool).at[:300].set(True),
        segment=jnp.zeros((n,), jnp.int32), depth=7, num_scenes=1,
    )
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(RNGS, point)
    state = TrainState.create(variables, optax.identity(), jax.random.PRNGKey(0))
    tester = SemSegTester(cfg, state=state, model=model)
    miou = tester.test()
    assert 0.0 <= miou <= 1.0
    assert os.path.isdir(os.path.join(save, "result"))
    subs = os.listdir(os.path.join(save, "submit"))
    assert len(subs) == 2  # one txt per scene

    # MSAI path: the DDIM step must compile once per bucket shape, not once
    # per fragment (round-1 weak #5). 2 scenes x 2 TTA augs = >=4 fragment
    # predictions over <=2 bucket sizes.
    cfg2 = cfg.copy()
    cfg2["inference_mode"] = "MSAI"
    cfg2["inference_step"] = 2
    cfg2["save_path"] = str(tmp_path / "exp_msai")
    tester2 = SemSegTester(cfg2, state=state, model=model)
    miou2 = tester2.test()
    assert 0.0 <= miou2 <= 1.0
    assert 1 <= tester2._ddim_trace_count <= len(cfg2.test_buckets)


@pytest.mark.slow
def test_tester_dict_output_model(tmp_path):
    """SemSegTester drives a dict-output (non-CNF) wrapper — the CAC
    segmentor — through the generic forward branch."""
    import jax
    import jax.numpy as jnp
    import optax

    from cdsegnet_tpu.engine.state import TrainState
    from cdsegnet_tpu.engine.test import SemSegTester
    from cdsegnet_tpu.models.builder import build_model
    from cdsegnet_tpu.models.structure import make_point_batch
    from test_model import RNGS

    root = str(tmp_path / "data")
    _write_synthetic_dataset(root, n_scenes=2, n_points=300)
    model_cfg = dict(
        type="CAC-v1m1", num_classes=5, backbone_out_channels=8,
        backbone=dict(type="SpUNet-v1m1", in_channels=6, num_classes=0,
                      base_channels=8, channels=(8, 8, 16, 16, 16, 16, 8, 8),
                      layers=(1, 1, 1, 1, 1, 1, 1, 1),
                      capacity_div=(1, 2, 4, 8, 8)),
    )
    cfg = Config(Config._wrap(dict(
        save_path=str(tmp_path / "exp"), seed=0, serialization_depth=7,
        test_buckets=[256, 512], ignore_index=-1, model=model_cfg,
        data=dict(
            num_classes=5, ignore_index=-1,
            names=[f"c{i}" for i in range(5)],
            test=dict(
                type="ScanNetDataset", split="val", data_root=root,
                transform=[dict(type="CenterShift", apply_z=True),
                           dict(type="NormalizeColor")],
                test_mode=True,
                test_cfg=dict(
                    voxelize=dict(type="GridSample", grid_size=0.1,
                                  hash_type="fnv", mode="test",
                                  keys=("coord", "color", "normal"),
                                  return_grid_coord=True),
                    crop=None,
                    post_transform=[
                        dict(type="CenterShift", apply_z=False),
                        dict(type="Collect",
                             keys=("coord", "grid_coord", "index"),
                             feat_keys=("color", "normal")),
                    ],
                    aug_transform=[
                        [dict(type="RandomRotateTargetAngle", angle=[0],
                              axis="z", center=[0, 0, 0], p=1)],
                    ],
                ),
            ),
        ),
    )))
    model = build_model(dict(model_cfg))
    n = 512
    point = make_point_batch(
        coord=jnp.zeros((n, 3)), feat=jnp.zeros((n, 6)),
        grid_coord=jnp.zeros((n, 3), jnp.int32),
        batch=jnp.zeros((n,), jnp.int32),
        mask=jnp.zeros((n,), bool).at[:300].set(True),
        segment=jnp.zeros((n,), jnp.int32), depth=7, num_scenes=1,
    )
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(RNGS, point)
    state = TrainState.create(variables, optax.identity(), jax.random.PRNGKey(0))
    tester = SemSegTester(cfg, state=state, model=model)
    miou = tester.test()
    assert miou is not None and 0.0 <= miou <= 1.0


def test_microbatch_grad_accumulation():
    """microbatch=K averages per-micro grads exactly (one optimizer update);
    integer diagnostics sum, float metrics average. Semantics counterpart of
    the reference's bs2/GPU recipe run as sequential scenes
    (`configs/scannet/CDSegNet.py:4-152`)."""
    import jax
    import jax.numpy as jnp
    import optax

    from cdsegnet_tpu.engine.state import TrainState, _build_grad_step

    def apply_loss(state, batch, rngs):
        def loss_fn(params):
            resid = params["w"] * batch["x"] - batch["y"]
            loss = jnp.sum(jnp.where(batch["m"], resid**2, 0.0))
            return loss, (dict(valid=jnp.sum(batch["m"])), state.batch_stats)

        def extra_metrics(out):
            return dict(valid_points=out["valid"])

        return loss_fn, extra_metrics

    tx = optax.sgd(0.5)
    params = {"w": jnp.asarray(2.0)}
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(2, 8), jnp.float32)
    ys = jnp.asarray(rng.randn(2, 8), jnp.float32)
    ms = jnp.asarray(rng.rand(2, 8) > 0.3)
    stacked = dict(x=xs, y=ys, m=ms)

    def make_state():
        return TrainState.create(
            {"params": params}, tx, jax.random.PRNGKey(0)
        )

    micro_fn = _build_grad_step(apply_loss, tx, mesh=None, microbatch=2)
    new_state, metrics = micro_fn(make_state(), stacked)

    # manual: mean of per-micro grads, one SGD update
    def loss_i(w, i):
        r = w * xs[i] - ys[i]
        return jnp.sum(jnp.where(ms[i], r**2, 0.0))

    g = np.mean([float(jax.grad(loss_i)(jnp.asarray(2.0), i)) for i in (0, 1)])
    expect_w = 2.0 - 0.5 * g
    np.testing.assert_allclose(float(new_state.params["w"]), expect_w, rtol=1e-6)
    expect_loss = np.mean([float(loss_i(jnp.asarray(2.0), i)) for i in (0, 1)])
    np.testing.assert_allclose(float(metrics["loss"]), expect_loss, rtol=1e-6)
    assert int(metrics["valid_points"]) == int(np.asarray(ms).sum())


def test_restack_requires_groups():
    """restack/unstack raise on a tree with no convertible block groups
    (a silent no-op hid already-converted checkpoints; round-4 advisor),
    and accept FrozenDict-typed trees."""
    import flax
    import jax.numpy as jnp
    import pytest as _pytest

    from cdsegnet_tpu.utils.params import (
        restack_block_params,
        unstack_block_params,
    )

    plain = {"head": {"kernel": jnp.zeros((2, 2))}}
    with _pytest.raises(ValueError):
        restack_block_params(plain)
    with _pytest.raises(ValueError):
        unstack_block_params(plain)
    assert restack_block_params(plain, allow_noop=True) == plain

    unrolled = flax.core.freeze({
        "enc_block0": {"w": jnp.ones((3,))},
        "enc_block1": {"w": jnp.full((3,), 2.0)},
    })
    scanned = restack_block_params(unrolled)
    assert scanned["enc_blocks"]["block"]["w"].shape == (2, 3)
    back = unstack_block_params(scanned)
    np.testing.assert_array_equal(back["enc_block1"]["w"], np.full((3,), 2.0))


@pytest.mark.slow
def test_train_unrolled_serve_scanned_roundtrip(tmp_path):
    """Production path (round-4 verdict #3): train the UNROLLED layout via
    the Trainer/CLI config, checkpoint, then `tools/test.py::load_state`
    builds the SCANNED serving model and converts the checkpoint — tester
    consumes it unmodified. Reference counterpart: one recipe config is both
    the production train entry and the test entry
    (`configs/scannet/CDSegNet.py:4-152`, `engines/test.py:58-87`)."""
    from test_model import TINY_BACKBONE

    root = str(tmp_path / "data")
    _write_synthetic_dataset(root)
    save = str(tmp_path / "exp")
    transform = [
        dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="train",
             return_grid_coord=True),
        dict(type="NormalizeColor"),
        dict(type="Collect", keys=("coord", "grid_coord", "segment"),
             feat_keys=("color", "normal")),
    ]
    # depth-2 stacks so the layouts differ non-trivially; training runs
    # the production layout: UNROLLED + FUSED dual gathers (+ whole-bucket
    # remat), serving converts to scanned + unfused
    backbone = dict(
        TINY_BACKBONE,
        n_enc_depths=(2, 1, 1, 1, 1), n_dec_depths=(2, 1, 1, 1),
        c_enc_depths=(2, 1, 1), c_dec_depths=(2, 1),
        scan_blocks=False, fuse_dual_gathers=True,
        remat_blocks=True, remat_policy="dots_saveable",
    )
    model_cfg = dict(
        type="DefaultSegmentorV2",
        backbone=backbone,
        criteria=[
            dict(type="MSELoss", loss_weight=1.0),
            dict(type="CrossEntropyLoss", loss_weight=1.0),
            dict(type="LovaszLoss", loss_weight=1.0),
        ],
        loss_type="GLS", task_num=2, num_classes=5, T=20,
        beta_start=0, beta_end=1000, noise_schedule="cosine", T_dim=16,
        dm=True, dm_input="xt", dm_target="noise", condition=True,
        c_in_channels=6,
    )
    cfg = Config(Config._wrap(dict(
        save_path=save, seed=0, num_devices=1, scenes_per_device=2,
        bucket_num_points=1024, val_num_points=512, serialization_depth=7,
        mix_prob=0.0, microbatch=2, epoch=1, resume=False,
        model=model_cfg,
        optimizer=dict(type="AdamW", lr=1e-3, weight_decay=0.01),
        scheduler=dict(type="OneCycleLR", pct_start=0.3),
        param_dicts=[dict(keyword="block", lr=1e-4)],
        test_buckets=[256, 512],
        data=dict(
            num_classes=5, ignore_index=-1,
            names=[f"c{i}" for i in range(5)],
            train=dict(type="ScanNetDataset", split="train", data_root=root,
                       transform=transform, test_mode=False),
            val=dict(type="ScanNetDataset", split="val", data_root=root,
                     transform=transform, test_mode=False),
            test=dict(
                type="ScanNetDataset", split="val", data_root=root,
                transform=[dict(type="CenterShift", apply_z=True),
                           dict(type="NormalizeColor")],
                test_mode=True,
                test_cfg=dict(
                    voxelize=dict(type="GridSample", grid_size=0.1,
                                  hash_type="fnv", mode="test",
                                  keys=("coord", "color", "normal"),
                                  return_grid_coord=True),
                    crop=None,
                    post_transform=[
                        dict(type="CenterShift", apply_z=False),
                        dict(type="Collect",
                             keys=("coord", "grid_coord", "index"),
                             feat_keys=("color", "normal")),
                    ],
                    aug_transform=[
                        [dict(type="RandomRotateTargetAngle", angle=[0],
                              axis="z", center=[0, 0, 0], p=1)],
                    ],
                ),
            ),
        ),
    )))
    from cdsegnet_tpu.engine.train import Trainer
    from cdsegnet_tpu.utils.params import detect_block_layout

    tr = Trainer(cfg)
    tr.train()
    assert detect_block_layout(tr.state.params) == "unrolled"
    assert "enc_dual0_block0" in tr.state.params["backbone"]  # trained fused
    assert tr.ckpt_manager.has("model_last")

    import importlib.util

    tool_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools", "test.py",
    )
    spec = importlib.util.spec_from_file_location("cdseg_test_tool", tool_path)
    test_tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(test_tool)
    model, state = test_tool.load_state(cfg, "model_last")
    assert detect_block_layout(state.params) == "scanned"
    assert model.backbone.scan_blocks is True
    assert model.backbone.fuse_dual_gathers is False
    assert not any(k.startswith(("enc_dual", "dec_dual"))
                   for k in state.params["backbone"])

    from cdsegnet_tpu.engine.test import SemSegTester

    tester = SemSegTester(cfg, state=state, model=model, verbose=False)
    miou = tester.test()
    assert 0.0 <= miou <= 1.0
