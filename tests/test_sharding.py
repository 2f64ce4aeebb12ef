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
