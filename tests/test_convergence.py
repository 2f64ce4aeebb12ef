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
    # the train loss bottoms out early, but the SSI inference path
    # (pure-noise c-input + BN running stats at momentum 0.01) catches up a
    # few hundred steps later; measured at round-4 HEAD: loss 2.15 ->
    # 0.00097 @700, SSI mIoU 0.98 (this fixture overflows pyramid levels
    # 1-2 — dropped_l1/l2 = 102/64 — exercising the sorted-fallback path)
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


def _overfit(model, criteria, batch, steps, lr=2e-3, num_scenes=2):
    """Shared tiny-overfit loop: returns (first, last) mean losses and the
    train-split mIoU through the eval path."""
    point = batch_to_point(
        {k: np.asarray(v) for k, v in batch.items()}, DEPTH, num_scenes
    )
    rngs = dict(
        params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
        shuffle=jax.random.PRNGKey(2), diffusion=jax.random.PRNGKey(3),
    )
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(rngs, point)
    tx = build_optimizer(
        dict(type="AdamW", lr=lr, weight_decay=0.01),
        variables["params"],
        scheduler_cfg=dict(type="OneCycleLR", pct_start=0.1,
                           div_factor=10.0, final_div_factor=100.0),
        total_steps=steps,
    )
    state = TrainState.create(variables, tx, jax.random.PRNGKey(0))
    step_fn = make_train_step(model, criteria, tx, DEPTH, num_scenes, mesh=None)
    losses = []
    for _ in range(steps):
        state, metrics = step_fn(state, batch)
        losses.append(metrics["loss"])
    losses = [float(x) for x in losses]
    first = float(np.mean(losses[:5]))
    last = float(np.mean(losses[-10:]))

    eval_fn = make_eval_step(model, None, DEPTH, num_scenes)
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
    return first, last, miou, losses


@pytest.mark.slow
def test_tiny_ptv3_plain_overfit():
    """Plain single-branch PTv3 (CE + Lovász only, no diffusion) overfits
    the tiny split — learning evidence for the `condition=False` path the
    reference's PTv3 baseline uses (`README.md:169`)."""
    from test_model import TINY_BACKBONE

    rng = np.random.RandomState(0)
    scenes = [_scene(rng, 120), _scene(rng, 110)]
    batch = collate_scenes(scenes, num_points=256, num_scenes=2)
    batch = {k: v for k, v in batch.items() if v is not None}

    bb = dict(TINY_BACKBONE, drop_path=0.0, num_classes=NUM_CLASSES,
              condition=False)
    model = build_model(
        dict(type="DefaultSegmentor", backbone=bb, num_classes=NUM_CLASSES)
    )
    criteria = build_criteria(
        [dict(type="CrossEntropyLoss", loss_weight=1.0),
         dict(type="LovaszLoss", loss_weight=1.0)],
        loss_type="EW",
    )
    # 700 steps like the flagship test: the eval path reads BN *running*
    # stats (reference momentum 0.01), which lag the train-mode batch stats
    # by several hundred steps (mIoU 0.70@400 measured)
    first, last, miou, losses = _overfit(model, criteria, batch, steps=700)
    assert np.isfinite(last)
    assert last < first / 5.0, (first, last)
    assert miou >= 0.9, (miou, losses[-5:])


@pytest.mark.slow
def test_tiny_ptv2_overfit():
    """PTv2 (grouped vector attention on the metric GridPool pyramid)
    overfits the tiny split — learning evidence for the zoo's kNN path
    (reference `point_transformer_v2m2_base.py`), whose fidelity closures
    previously had only forward/parity tests."""
    rng = np.random.RandomState(0)
    scenes = [_scene(rng, 120), _scene(rng, 110)]
    batch = collate_scenes(scenes, num_points=256, num_scenes=2)
    batch = {k: v for k, v in batch.items() if v is not None}

    bb = dict(
        type="PT-v2m2", in_channels=6, num_classes=NUM_CLASSES,
        patch_embed_channels=8, patch_embed_groups=2,
        enc_channels=(16, 32), enc_depths=(1, 1), enc_groups=(4, 8),
        dec_channels=(16, 16), dec_depths=(1, 1), dec_groups=(4, 4),
        k_neighbors=8, capacity_div=(1, 2, 4),
        grid_sizes=(0.12, 0.24),
    )
    model = build_model(
        dict(type="DefaultSegmentor", backbone=bb, num_classes=NUM_CLASSES)
    )
    criteria = build_criteria(
        [dict(type="CrossEntropyLoss", loss_weight=1.0),
         dict(type="LovaszLoss", loss_weight=1.0)],
        loss_type="EW",
    )
    first, last, miou, losses = _overfit(model, criteria, batch, steps=400)
    assert np.isfinite(last)
    assert last < first / 5.0, (first, last)
    assert miou >= 0.9, (miou, losses[-5:])
