"""Forward + grad smoke tests for the second-tier model zoo
(SPVCNN / OA-CNNs / OctFormer)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cdsegnet_tpu.models.builder import build_model
from helpers import synthetic_batch
from test_model import RNGS


def _check_forward_and_grad(cfg, pt, num_classes=5):
    model = build_model(cfg)
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(RNGS, pt)
    out = jax.jit(lambda v, p: model.apply(v, p, train=False))(variables, pt)
    assert out.feat.shape == (pt.num_points, num_classes)
    assert np.isfinite(np.asarray(out.feat)).all()
    # padded slots must not produce NaNs through masked norms

    def loss_fn(params):
        o, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pt, train=True, rngs=RNGS, mutable=["batch_stats"],
        )
        valid = pt.mask & (pt.segment >= 0)
        logp = jax.nn.log_softmax(o.feat.astype(jnp.float32))
        nll = -jnp.take_along_axis(
            logp, jnp.clip(pt.segment, 0, num_classes - 1)[:, None], axis=1
        )[:, 0]
        return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert np.isfinite(float(loss))
    gmax = max(
        float(jnp.max(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads)
    )
    assert np.isfinite(gmax) and gmax > 0


def test_spvcnn(rng):
    pt = synthetic_batch(rng, counts=(150, 90), num_points=256, depth=6)
    _check_forward_and_grad(
        dict(type="SPVCNN", in_channels=6, num_classes=5, base_channels=8,
             channels=(8, 8, 16, 16, 16, 16, 8, 8), layers=(1, 1, 1, 1, 1, 1, 1, 1),
             capacity_div=(1, 2, 4, 8, 8)),
        pt,
    )


def test_oacnns(rng):
    pt = synthetic_batch(rng, counts=(150, 90), num_points=256, depth=6)
    _check_forward_and_grad(
        dict(type="OACNNs", in_channels=6, num_classes=5, embed_channels=8,
             enc_channels=(8, 8, 16, 16), enc_depth=(1, 1, 1, 1),
             dec_channels=(8, 8, 16, 16),
             point_grid_size=((4, 6), (4, 6), (2, 3), (2, 3)),
             capacity_div=(1, 2, 4, 8, 8)),
        pt,
    )


def test_octformer(rng):
    pt = synthetic_batch(rng, counts=(150, 90), num_points=256, depth=6)
    _check_forward_and_grad(
        dict(type="OctFormer-v1m1", in_channels=6, num_classes=5,
             fpn_channels=8, channels=(8, 8, 16, 16), num_blocks=(2, 1, 1, 1),
             num_heads=(2, 2, 2, 2), patch_size=8, dilation=2, stem_down=2,
             head_up=2, capacity_div=(1, 2, 4, 8, 8, 8)),
        pt,
    )


def test_stratified():
    rng = np.random.RandomState(3)
    pt = synthetic_batch(rng, counts=(150, 90), num_points=256, depth=6)
    _check_forward_and_grad(
        dict(type="StratifiedTransformer", in_channels=6, num_classes=5,
             channels=(8, 8, 16, 16), depths=(1, 1, 1, 1),
             num_heads=(2, 2, 2, 2), patch_size=16,
             capacity_div=(1, 2, 4, 8, 16)),
        pt,
    )


def test_exact_sparse_attention_matches_dense():
    """The attention_v2-equivalent op equals dense attention when every
    query's key list is the full set."""
    import jax

    from cdsegnet_tpu.ops.sparse_attention import exact_sparse_attention

    rng = np.random.RandomState(0)
    n, h, d = 24, 2, 8
    q = jnp.asarray(rng.randn(n, h, d).astype(np.float32))
    k = jnp.asarray(rng.randn(n, h, d).astype(np.float32))
    v = jnp.asarray(rng.randn(n, h, d).astype(np.float32))
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (n, n))
    out = exact_sparse_attention(q, k, v, idx)
    ref = jax.nn.softmax(
        jnp.einsum("nhd,mhd->hnm", q * d**-0.5, k), axis=-1
    )
    ref = jnp.einsum("hnm,mhd->nhd", ref, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # sparse subsets + missing slots: each query its 4 predecessors
    s = 4
    rows = []
    for i in range(n):
        row = [j for j in range(max(0, i - s), i)] + [n] * (s - min(i, s))
        rows.append(row)
    idx2 = jnp.asarray(np.asarray(rows, np.int32))
    out2 = exact_sparse_attention(q, k, v, idx2)
    assert np.isfinite(np.asarray(out2[1:])).all()
    # query 0 has no valid keys -> zero output
    np.testing.assert_allclose(np.asarray(out2[0]), 0.0, atol=1e-6)


def test_masked_scene_contrast():
    """MSC pretraining: cross masks are complementary per grid cell, the
    InfoNCE + reconstruction losses are finite and produce gradients."""
    import jax

    from helpers import synthetic_batch

    rng = np.random.RandomState(5)
    pt1 = synthetic_batch(rng, counts=(200,), num_points=256, depth=6)
    # view2 = same points, tiny perturbation (well inside match radius)
    pt2 = pt1.replace(coord=pt1.coord + 0.001)
    origin = pt1.coord
    bb = dict(type="SpUNet-v1m1", in_channels=6, num_classes=16,
              base_channels=8, channels=(8, 8, 16, 16, 16, 16, 8, 8),
              layers=(1, 1, 1, 1, 1, 1, 1, 1), capacity_div=(1, 2, 4, 8, 8))
    model = build_model(dict(
        type="MSC", backbone=bb, backbone_in_channels=6,
        backbone_out_channels=16, matching_max_radius=0.05,
        matching_max_pair=128, mask_grid_size=0.5,
    ))
    tgt = dict(color=np.asarray(rng.rand(256, 3), np.float32),
               normal=np.asarray(rng.rand(256, 3), np.float32))
    tgt = {k: jnp.asarray(v) for k, v in tgt.items()}
    variables = jax.jit(
        lambda r: model.init(r, pt1, pt2, origin, origin, tgt, tgt, train=False)
    )(RNGS)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pt1, pt2, origin, origin, tgt, tgt, train=True,
            rngs=RNGS, mutable=["batch_stats"],
        )
        return out["loss"], out

    (loss, out), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(variables["params"])
    assert np.isfinite(float(loss))
    assert float(loss) > 0
    assert "nce_loss" in out and "color_loss" in out and "normal_loss" in out
    # complementary masks: a point masked in view1 is never masked in view2
    m1 = np.asarray(out["view1_mask"])
    m2 = np.asarray(out["view2_mask"])
    assert not (m1 & m2).any()
    assert m1.any() and m2.any()
    g = grads["mask_token"]
    assert np.isfinite(np.asarray(g)).all()


def test_cac_segmentor(rng):
    """CAC: refined cosine logits in both modes, adaptive-perspective logits
    in train, all four loss terms finite with nonzero grads."""
    from cdsegnet_tpu.models.losses import Criteria

    pt = synthetic_batch(rng, counts=(150, 90), num_points=256, depth=6)
    bb = dict(type="SpUNet-v1m1", in_channels=6, num_classes=0,
              base_channels=8, channels=(8, 8, 16, 16, 16, 16, 8, 8),
              layers=(1, 1, 1, 1, 1, 1, 1, 1), capacity_div=(1, 2, 4, 8, 8))
    model = build_model(dict(
        type="CAC-v1m1", backbone=bb, num_classes=5,
        backbone_out_channels=8, cos_temp=15,
    ))
    criteria = Criteria([
        dict(type="CrossEntropyLoss", pred="n_pred", loss_weight=1.0),
        dict(type="CrossEntropyLoss", pred="cac_pred", loss_weight=1.0),
        dict(type="CrossEntropyLoss", pred="pre_pred", loss_weight=1.0),
        dict(type="CACDistillLoss", pred="n_pred", soft="cac_pred",
             loss_weight=1.0),
    ])
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(RNGS, pt)
    out = jax.jit(lambda v, p: model.apply(v, p, train=False))(variables, pt)
    assert out["n_pred"].shape == (pt.num_points, 5)
    assert "cac_pred" not in out  # eval has no ground-truth prototypes
    # cosine logits are bounded by the temperature
    assert float(jnp.max(jnp.abs(out["n_pred"]))) <= 15.0 + 1e-4

    def loss_fn(params):
        o, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pt, train=True, rngs=RNGS, mutable=["batch_stats"],
        )
        return criteria(o), o

    (loss, o), grads = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(
        variables["params"]
    )
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert o["cac_pred"].shape == (pt.num_points, 5)
    for name in ("seg_head_kernel", "proj_0", "apd_proj_0", "feat_proj_0"):
        g = grads[name] if name == "seg_head_kernel" else grads[name]["kernel"]
        assert float(jnp.max(jnp.abs(g))) > 0, name


def test_swin3d(rng):
    """Swin3D: cRSE window attention forward + grad; table params exist for
    each enabled signal."""
    pt = synthetic_batch(rng, counts=(150, 90), num_points=256, depth=6)
    cfg = dict(type="Swin3D-v1m1", in_channels=6, num_classes=5,
               base_grid_size=0.02, depths=(1, 1, 1), channels=(8, 16, 16),
               num_heads=(2, 2, 2), window_sizes=(5, 7, 7), quant_size=2,
               patch_size=16, capacity_div=(1, 2, 4), cRSE="XYZ_RGB",
               color_slice=(0, 3), normal_slice=(3, 6))
    _check_forward_and_grad(cfg, pt)
    model = build_model(cfg)
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(RNGS, pt)
    attn0 = variables["params"]["layer0_block0"]["attn"]
    for sig in ("xyz", "rgb"):
        for t in ("query", "key", "value"):
            assert f"{t}_{sig}_table" in attn0
    assert "query_norm_table" not in attn0


def test_ptv1_faithful(rng):
    """Faithful PTv1: Seg-style 5-stage FPS UNet forwards, grads flow, and
    per-level FPS counts respect the per-scene stride-4 quota."""
    pt = synthetic_batch(rng, counts=(180, 120), num_points=320, depth=6)
    _check_forward_and_grad(
        dict(type="PT-v1", in_channels=6, num_classes=5,
             channels=(8, 8, 16, 16, 16), depths=(1, 1, 1, 1, 1),
             share_planes=4, nsample=(4, 8, 8, 8, 8),
             capacity_div=(1, 4, 16, 64, 256)),
        pt,
    )
    # the registered Seg26 alias builds with reference depths
    from cdsegnet_tpu.models.ptv1 import PointTransformerSeg26

    assert PointTransformerSeg26().depths == (1, 1, 1, 1, 1)
