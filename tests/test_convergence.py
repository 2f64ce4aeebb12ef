"""Learning-dynamics evidence: the flagship CNF segmentor overfits a tiny
synthetic train split.

The reference's acceptance metric is Model-Zoo mIoU on real datasets
(`/root/reference/README.md:161-179`), which this environment cannot
reproduce; a tiny-overfit run — loss down >=10x, train-split mIoU >= 0.9 —
is the strongest accuracy proxy available and guards against silently
broken gradients (e.g. a 1e-8 scale bug would still pass step-count
tests)."""

import jax
import numpy as np
import optax  # noqa: F401
import pytest

from cdsegnet_tpu.data.collate import collate_scenes
from cdsegnet_tpu.engine.optimizer import build_optimizer
from cdsegnet_tpu.engine.state import (
    TrainState,
    batch_to_point,
    make_eval_step,
    make_train_step,
)
from cdsegnet_tpu.models.builder import build_model
from cdsegnet_tpu.models.losses import build_criteria

NUM_CLASSES = 4
DEPTH = 6


def _scene(rng: np.random.RandomState, n: int):
    """Clustered points whose class is a deterministic function of position
    (spatial quadrant) with class-colored features — fully learnable."""
    coord = rng.rand(n, 3).astype(np.float32) * 2.0
    label = (coord[:, 0] > 1.0).astype(np.int64) * 2 + (
        coord[:, 1] > 1.0
    ).astype(np.int64)
    prototypes = np.eye(NUM_CLASSES, 3, dtype=np.float32)  # distinct colors
    color = prototypes[label] + rng.randn(n, 3).astype(np.float32) * 0.02
    normal = rng.randn(n, 3).astype(np.float32) * 0.1
    return dict(
        coord=coord,
        grid_coord=(coord / 0.05).astype(np.int32),
        feat=np.concatenate([color, normal], axis=1),
        segment=label.astype(np.int32),
    )


@pytest.mark.slow
def test_tiny_flagship_overfit():
    from test_model import TINY_BACKBONE, TINY_MODEL

    rng = np.random.RandomState(0)
    scenes = [_scene(rng, 120), _scene(rng, 110)]
    batch = collate_scenes(scenes, num_points=256, num_scenes=2)
    batch = {k: v for k, v in batch.items() if v is not None}

    bb = dict(TINY_BACKBONE, drop_path=0.0, num_classes=NUM_CLASSES)
    model = build_model(dict(TINY_MODEL, backbone=bb, num_classes=NUM_CLASSES))
    criteria = build_criteria(
        [dict(type="MSELoss", loss_weight=1.0),
         dict(type="CrossEntropyLoss", loss_weight=1.0),
         dict(type="LovaszLoss", loss_weight=1.0)],
        loss_type="GLS", task_num=2,
    )
    point = batch_to_point(
        {k: np.asarray(v) for k, v in batch.items()}, DEPTH, 2
    )
    rngs = dict(
        params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
        shuffle=jax.random.PRNGKey(2), diffusion=jax.random.PRNGKey(3),
    )
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(rngs, point)
    # the train loss bottoms out by ~step 200, but the SSI inference path
    # (pure-noise c-input + BN running stats) catches up later: measured
    # mIoU 0.28@300 -> 0.86@500 -> 1.00@600 on this setup
    steps = 700
    tx = build_optimizer(
        dict(type="AdamW", lr=2e-3, weight_decay=0.01),
        variables["params"],
        scheduler_cfg=dict(type="OneCycleLR", pct_start=0.1,
                           div_factor=10.0, final_div_factor=100.0),
        total_steps=steps,
    )
    state = TrainState.create(variables, tx, jax.random.PRNGKey(0))
    step_fn = make_train_step(model, criteria, tx, DEPTH, 2, mesh=None)

    losses = []
    for _ in range(steps):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    first = float(np.mean(losses[:5]))
    last = float(np.mean(losses[-10:]))
    assert np.isfinite(last)
    assert last < first / 10.0, (first, last)

    # train-split mIoU through the SSI inference path
    eval_fn = make_eval_step(model, None, DEPTH, 2)
    out = eval_fn(state, batch, jax.random.PRNGKey(9))
    pred = np.asarray(out["seg_logits"]).argmax(-1)
    seg = np.asarray(batch["segment"])
    valid = np.asarray(batch["mask"]) & (seg >= 0)
    inter = np.zeros(NUM_CLASSES)
    union = np.zeros(NUM_CLASSES)
    for c in range(NUM_CLASSES):
        gt = (seg == c) & valid
        pd = (pred == c) & valid
        inter[c] = (gt & pd).sum()
        union[c] = (gt | pd).sum()
    present = union > 0
    miou = float((inter[present] / union[present]).mean())
    assert miou >= 0.9, (miou, losses[-5:])
