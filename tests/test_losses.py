"""Loss parity tests (golden values from the reference torch implementation)."""

import json
import os

import jax.numpy as jnp
import numpy as np

from cdsegnet_tpu.models.losses import (
    Criteria,
    cross_entropy_loss,
    dice_loss,
    focal_loss,
    lovasz_softmax_loss,
    masked_mean,
    mse_loss,
)

GOLDEN = json.load(open(os.path.join(os.path.dirname(__file__), "golden_losses.json")))


def _golden_inputs():
    logits = jnp.asarray(np.array(GOLDEN["logits"], np.float32))
    labels = jnp.asarray(np.array(GOLDEN["labels"], np.int32))
    valid = labels >= 0
    return logits, labels, valid


def test_cross_entropy_golden():
    logits, labels, valid = _golden_inputs()
    got = float(cross_entropy_loss(logits, labels, valid))
    np.testing.assert_allclose(got, GOLDEN["ce"], rtol=1e-5)


def test_lovasz_golden():
    logits, labels, valid = _golden_inputs()
    got = float(lovasz_softmax_loss(logits, labels, valid))
    np.testing.assert_allclose(got, GOLDEN["lovasz"], rtol=1e-5)


def test_lovasz_ignores_invalid(rng):
    logits, labels, valid = _golden_inputs()
    # corrupting invalid rows must not change the loss
    big = jnp.where(valid[:, None], logits, 1e3)
    a = float(lovasz_softmax_loss(logits, labels, valid))
    b = float(lovasz_softmax_loss(big, labels, valid))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_mse_masked(rng):
    pred = jnp.asarray(rng.randn(50, 6).astype(np.float32))
    target = jnp.asarray(rng.randn(50, 6).astype(np.float32))
    valid = jnp.asarray(np.arange(50) < 30)
    got = float(mse_loss(pred, target, valid))
    want = float(np.mean((np.asarray(pred)[:30] - np.asarray(target)[:30]) ** 2))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_gls_combiner(rng):
    logits, labels, valid = _golden_inputs()
    out = dict(
        c_pred=jnp.asarray(rng.randn(200, 6).astype(np.float32)),
        c_target=jnp.asarray(rng.randn(200, 6).astype(np.float32)),
        n_pred=logits,
        n_target=labels,
        seg_valid=valid,
    )
    crit = Criteria(
        [
            dict(type="MSELoss", loss_weight=1.0),
            dict(type="CrossEntropyLoss", loss_weight=1.0),
            dict(type="LovaszLoss", loss_weight=1.0),
        ],
        loss_type="GLS",
        task_num=2,
    )
    gls = float(crit(out, mode="train"))
    mse = float(mse_loss(out["c_pred"], out["c_target"], valid))
    ce = float(cross_entropy_loss(logits, labels, valid))
    lv = float(lovasz_softmax_loss(logits, labels, valid))
    np.testing.assert_allclose(gls, np.sqrt(mse * (ce + lv)), rtol=1e-5)
    # eval mode sums terms (EW)
    ew = float(crit(out, mode="eval"))
    np.testing.assert_allclose(ew, mse + ce + lv, rtol=1e-5)


def test_focal_dice_finite(rng):
    logits, labels, valid = _golden_inputs()
    assert np.isfinite(float(focal_loss(logits, labels, valid)))
    assert np.isfinite(float(dice_loss(logits, labels, valid)))


def test_cac_distill_parity_vs_torch():
    """cac_distill_loss vs a direct torch port of the reference
    `CACSegmentor.get_distill_loss` (`context_aware_classifier_v1m1_base.py
    :151-198`), including the -1 ignore handling."""
    import torch
    import torch.nn.functional as F

    from cdsegnet_tpu.models.losses import cac_distill_loss

    rng = np.random.RandomState(3)
    n, c = 64, 5
    pred = rng.randn(n, c).astype(np.float32)
    soft = rng.randn(n, c).astype(np.float32)
    target = rng.randint(0, c, n).astype(np.int64)
    target[:7] = -1  # ignore rows

    def torch_ref(pred, soft, target, smoothness=0.5, eps=0.0):
        pred = torch.tensor(pred)
        soft = torch.tensor(soft)
        target = torch.tensor(target).unsqueeze(-1)
        n, c = soft.shape
        onehot = target.view(-1, 1)
        ignore_mask = (onehot == -1).float()
        sm_soft = F.softmax(soft, 1)
        onehot = onehot * (1 - ignore_mask)
        onehot = torch.zeros(n, c).scatter_(1, onehot.long(), 1)
        smoothed = smoothness * sm_soft + (1 - smoothness) * onehot
        if eps > 0:
            smoothed = smoothed * (1 - eps) + (1 - smoothed) * eps / (c - 1)
        loss = (-1 * F.log_softmax(pred, dim=1) * smoothed).sum(1)
        entropy_mask = -1 * (sm_soft * torch.log(sm_soft + 1e-4)).sum(1)
        target = target.squeeze(-1)
        unique_classes = [y for y in target.unique().tolist() if y != -1]
        valid_mask = (target != -1).float()
        entropy_mask = entropy_mask * valid_mask
        loss_list, weight_list = [], []
        for y in unique_classes:
            m = (target == y).float()
            em = entropy_mask * m
            loss_list.append((loss * em).sum() / (em.sum() + 1e-4))
            weight_list.append(1)
        return float(sum(loss_list) / (sum(weight_list) + 1e-4))

    got = float(cac_distill_loss(
        jnp.asarray(pred), jnp.asarray(soft), jnp.asarray(target),
        jnp.ones(n, bool),
    ))
    want = torch_ref(pred, soft, target)
    np.testing.assert_allclose(got, want, rtol=2e-5)
    # with eps label smoothing too
    got2 = float(cac_distill_loss(
        jnp.asarray(pred), jnp.asarray(soft), jnp.asarray(target),
        jnp.ones(n, bool), eps=0.1,
    ))
    want2 = torch_ref(pred, soft, target, eps=0.1)
    np.testing.assert_allclose(got2, want2, rtol=2e-5)
