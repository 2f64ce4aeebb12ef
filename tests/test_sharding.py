"""Data-parallel training step over the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from cdsegnet_tpu.engine.optimizer import build_optimizer, clip_by_keyword
from cdsegnet_tpu.engine.state import TrainState, make_train_step
from cdsegnet_tpu.models.builder import build_model
from cdsegnet_tpu.models.losses import build_criteria
from cdsegnet_tpu.parallel.mesh import make_mesh
from helpers import synthetic_batch
from test_model import RNGS, TINY_MODEL

# the pallas kernel only runs on TPU; this test drives a CPU mesh
CPU_MODEL = dict(TINY_MODEL)
CPU_MODEL["backbone"] = dict(TINY_MODEL["backbone"], use_pallas=False)

import optax

NUM_POINTS, DEPTH, NUM_SCENES = 256, 6, 2


def _np_batch(seed):
    rng = np.random.RandomState(seed)
    pt = synthetic_batch(rng, counts=(120, 90), num_points=NUM_POINTS, depth=DEPTH)
    return dict(
        coord=np.asarray(pt.coord),
        grid_coord=np.asarray(pt.grid_coord),
        feat=np.asarray(pt.feat),
        segment=np.asarray(pt.segment),
        batch=np.asarray(pt.batch),
        mask=np.asarray(pt.mask),
    )


@pytest.mark.slow
def test_dp_train_step_8dev():
    from conftest import cpu_devices

    devs = cpu_devices(8)
    model = build_model(CPU_MODEL)
    criteria = build_criteria(
        [
            dict(type="MSELoss", loss_weight=1.0),
            dict(type="CrossEntropyLoss", loss_weight=1.0),
            dict(type="LovaszLoss", loss_weight=1.0),
        ],
        loss_type="GLS",
        task_num=2,
    )
    rng = np.random.RandomState(0)
    pt = synthetic_batch(rng, counts=(120, 90), num_points=NUM_POINTS, depth=DEPTH)
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(RNGS, pt)
    tx = optax.chain(
        clip_by_keyword(["block"], 0.1),
        build_optimizer(
            dict(type="AdamW", lr=2e-3, weight_decay=0.05),
            variables["params"],
            scheduler_cfg=dict(type="OneCycleLR", pct_start=0.5),
            total_steps=10,
            param_dicts=[dict(keyword="block", lr=2e-4)],
        ),
    )
    mesh = make_mesh(devices=devs)
    from cdsegnet_tpu.parallel.mesh import replicated

    state = jax.device_put(
        TrainState.create(variables, tx, jax.random.PRNGKey(0)), replicated(mesh)
    )
    step_fn = make_train_step(model, criteria, tx, DEPTH, NUM_SCENES, mesh)
    batches = [_np_batch(i) for i in range(8)]
    batch = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, metrics = step_fn(state, batch)
    loss = float(metrics["loss"])
    assert np.isfinite(loss) and loss > 0
    assert int(state.step) == 1
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # params stay replicated (single logical value)
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert not leaf.is_deleted()
    # second step runs from updated state
    state, metrics2 = step_fn(state, batch)
    assert np.isfinite(float(metrics2["loss"]))


@pytest.mark.slow
def test_sharded_tester_matches_single_device(tmp_path):
    """Fragment-parallel testing over the virtual 8-device mesh produces the
    SAME per-scene records as single-device sequential testing (round-4
    verdict #4; reference shards scenes across DDP ranks,
    `engines/test.py:91-94,372-414`)."""
    import os

    import torch

    from cdsegnet_tpu.engine.config import Config
    from cdsegnet_tpu.engine.test import SemSegTester
    from cdsegnet_tpu.models.structure import make_point_batch

    import jax.numpy as jnp
    import optax

    root = str(tmp_path / "data")
    rng = np.random.RandomState(0)
    os.makedirs(os.path.join(root, "val"), exist_ok=True)
    for i in range(3):
        n = 280 + 30 * i
        torch.save(
            dict(
                coord=rng.rand(n, 3).astype(np.float32) * 3,
                color=(rng.rand(n, 3) * 255).astype(np.float32),
                normal=rng.randn(n, 3).astype(np.float32),
                semantic_gt20=rng.randint(0, 5, (n,)).astype(np.int64),
            ),
            os.path.join(root, "val", f"scene{i:04d}.pth"),
        )

    def make_cfg(save, num_devices):
        return Config(Config._wrap(dict(
            save_path=save, seed=0, serialization_depth=7,
            num_devices=num_devices,
            test_buckets=[256, 512], ignore_index=-1, model=TINY_MODEL,
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

    t1 = SemSegTester(make_cfg(str(tmp_path / "e1"), 1), state=state,
                      model=model, verbose=False)
    assert t1.mesh is None
    miou1 = t1.test()
    t8 = SemSegTester(make_cfg(str(tmp_path / "e8"), 8), state=state,
                      model=model, verbose=False)
    assert t8.mesh is not None and int(t8.mesh.devices.size) == 8
    miou8 = t8.test()

    assert set(t1.records) == set(t8.records)
    for name in t1.records:
        for k in ("intersection", "union", "target"):
            np.testing.assert_array_equal(
                t1.records[name][k], t8.records[name][k],
                err_msg=f"{name}/{k} diverged between 1- and 8-device testing",
            )
    np.testing.assert_allclose(miou1, miou8, rtol=1e-6)
