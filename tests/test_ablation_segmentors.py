"""Tiny-config smoke/shape tests for the NCF ablation segmentor family."""

import jax
import numpy as np
import pytest

from cdsegnet_tpu.models.builder import build_model
from helpers import synthetic_batch
from test_model import RNGS, TINY_BACKBONE


def _cfg(kind, **over):
    bb = dict(TINY_BACKBONE)
    if kind in ("ContinuousDMSegmentor", "DiscreteDMSegmentor"):
        bb["c_in_channels"] = 5  # labels ride the c branch
        bb["n_in_channels"] = 6
    elif kind in ("CCDMSegmentor", "CDDMSegmentor"):
        bb["c_in_channels"] = 6  # features on c, labels on n
        bb["n_in_channels"] = 5
    elif kind == "DMSegmentor":
        bb["condition"] = False
        bb["n_in_channels"] = 5
    cfg = dict(
        type=kind,
        backbone=bb,
        num_classes=5,
        T=20,
        beta_start=0,
        beta_end=1000,
        noise_schedule="cosine",
        T_dim=16,
        dm=True,
        condition=bb.get("condition", True),
        c_in_channels=bb.get("c_in_channels", 6),
    )
    cfg.update(over)
    return cfg


@pytest.mark.parametrize(
    "kind",
    ["ContinuousDMSegmentor", "CCDMSegmentor", "DiscreteDMSegmentor",
     "CDDMSegmentor", "DMSegmentor"],
)
def test_ablation_forward(kind, rng):
    pt = synthetic_batch(rng, counts=(150, 90), num_points=256, depth=6)
    if kind in ("ContinuousDMSegmentor", "CCDMSegmentor", "DiscreteDMSegmentor",
                "CDDMSegmentor", "DMSegmentor"):
        # the diffusion branch consumes label-channels; synthetic feat has 6,
        # which only matters for the c side
        pass
    model = build_model(_cfg(kind))
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(RNGS, pt)
    out = jax.jit(
        lambda v, p: model.apply(v, p, train=True, rngs=RNGS, mutable=["batch_stats"])
    )(variables, pt)[0]
    assert out["n_pred"].shape == (256, 5)
    assert np.isfinite(np.asarray(out["n_pred"])).all()


@pytest.mark.parametrize("kind", ["DiscreteDMSegmentor", "CDDMSegmentor"])
def test_d3pm_branch_trains(kind, rng):
    """The D3PM posterior KL must produce nonzero gradients through the
    diffused branch (round-1 missing #1: d3pm logits were computed but no
    loss consumed them)."""
    import jax.numpy as jnp

    from cdsegnet_tpu.models.losses import build_criteria

    pt = synthetic_batch(rng, counts=(150, 90), num_points=256, depth=6)
    model = build_model(_cfg(kind))
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(RNGS, pt)
    criteria = build_criteria(
        [dict(type="D3PMKLLoss", loss_weight=1.0),
         dict(type="CrossEntropyLoss", loss_weight=1.0)],
        loss_type="EW",
    )

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pt, train=True, rngs=RNGS, mutable=["batch_stats"],
        )
        assert "d3pm_pred_q" in out and "d3pm_true_q" in out
        return criteria(out, mode="train")

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert np.isfinite(float(loss))
    # the diffused branch's head must receive gradient through the KL term
    head = "c_head" if kind == "DiscreteDMSegmentor" else "n_head"
    g = grads["backbone"][head]["kernel"]
    assert float(jnp.max(jnp.abs(g))) > 0.0


@pytest.mark.parametrize(
    "kind",
    ["ContinuousDMSegmentor", "CCDMSegmentor", "DiscreteDMSegmentor",
     "CDDMSegmentor", "DMSegmentor"],
)
def test_ablation_multistep_inference(kind, rng):
    """Multi-step reverse-process inference (MSAI/MSFI) for every ablation
    family (reference per-family `inference_ddim`)."""
    from cdsegnet_tpu.models.ablation_segmentors import inference_multistep

    pt = synthetic_batch(rng, counts=(150, 90), num_points=256, depth=6)
    model = build_model(_cfg(kind))
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(RNGS, pt)
    logits = inference_multistep(
        model, variables, pt, jax.random.PRNGKey(3), step=2, mode="avg"
    )
    assert logits.shape == (256, 5)
    assert np.isfinite(np.asarray(logits)).all()
    logits_f = inference_multistep(
        model, variables, pt, jax.random.PRNGKey(3), step=2, mode="final"
    )
    assert np.isfinite(np.asarray(logits_f)).all()


def test_classifier(rng):
    pt = synthetic_batch(rng, counts=(150, 90), num_points=256, depth=6)
    bb = dict(TINY_BACKBONE)
    bb["condition"] = False
    model = build_model(dict(type="DefaultClassifier", backbone=bb, num_classes=7))
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(RNGS, pt)
    out = jax.jit(lambda v, p: model.apply(v, p, train=False))(variables, pt)
    assert out["cls_pred"].shape == (2, 7)
    assert np.isfinite(np.asarray(out["cls_pred"])).all()


def test_spunet(rng):
    import jax

    pt = synthetic_batch(rng, counts=(150, 90), num_points=256, depth=6)
    model = build_model(dict(
        type="SpUNet-v1m1", in_channels=6, num_classes=5, base_channels=8,
        channels=(8, 8, 16, 16, 16, 16, 8, 8), layers=(1, 1, 1, 1, 1, 1, 1, 1),
        capacity_div=(1, 2, 4, 8, 8),
    ))
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(RNGS, pt)
    out = jax.jit(lambda v, p: model.apply(v, p, train=False))(variables, pt)
    assert out.feat.shape == (256, 5)
    import numpy as np

    assert np.isfinite(np.asarray(out.feat)).all()


def test_ptv2_and_ptv1(rng):
    import jax

    pt = synthetic_batch(rng, counts=(80, 60), num_points=160, depth=6)
    for cfg in (
        dict(type="PT-v2m2", in_channels=6, num_classes=5,
             patch_embed_channels=8, patch_embed_groups=2,
             enc_channels=(8, 16), enc_depths=(1, 1),
             enc_groups=(2, 4), dec_channels=(8, 8), dec_depths=(1, 1),
             dec_groups=(2, 2), k_neighbors=8, capacity_div=(1, 2, 4)),
        dict(type="PT-v1", in_channels=6, num_classes=5,
             channels=(8, 16, 16), depths=(1, 1, 1), share_planes=4,
             nsample=(8, 8, 8), capacity_div=(1, 4, 16)),
    ):
        model = build_model(cfg)
        variables = jax.jit(lambda r, p: model.init(r, p, train=False))(RNGS, pt)
        out = jax.jit(lambda v, p: model.apply(v, p, train=False))(variables, pt)
        assert out.feat.shape == (160, 5)
        import numpy as np

        assert np.isfinite(np.asarray(out.feat)).all()


def test_pointgroup_cluster(rng):
    import jax
    import jax.numpy as jnp

    from cdsegnet_tpu.models.pointgroup import connected_components

    # two well-separated blobs -> two components
    a = rng.randn(40, 3).astype(np.float32) * 0.01
    b = rng.randn(40, 3).astype(np.float32) * 0.01 + 5.0
    coord = jnp.asarray(np.concatenate([a, b]))
    valid = jnp.asarray(np.ones(80, bool))
    labels = np.asarray(connected_components(coord, valid, radius=0.2, nsample=8))
    assert len(set(labels[:40].tolist())) == 1
    assert len(set(labels[40:].tolist())) == 1
    assert labels[0] != labels[40]


def test_pointgroup_model(rng):
    import jax

    pt = synthetic_batch(rng, counts=(100, 60), num_points=192, depth=6)
    bb = dict(TINY_BACKBONE)
    bb["condition"] = False
    model = build_model(dict(type="PointGroup", backbone=bb, num_classes=5))
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(RNGS, pt)
    out = jax.jit(lambda v, p: model.apply(v, p, train=False))(variables, pt)
    assert out["n_pred"].shape == (192, 5)
    assert out["offset_pred"].shape == (192, 3)
    import numpy as np

    sem = np.asarray(out["n_pred"]).argmax(-1)
    clusters = model.apply(
        variables, pt, jax.numpy.asarray(sem), out["offset_pred"],
        method=type(model).cluster,
    )
    assert clusters.shape == (192,)
