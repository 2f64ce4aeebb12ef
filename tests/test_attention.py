"""Masked serialized patch attention vs per-scene brute force."""

import jax
import jax.numpy as jnp
import numpy as np

from cdsegnet_tpu.models.structure import serialize
from cdsegnet_tpu.ops.attention import cross_patch_attention, patch_attention
from helpers import synthetic_batch

ORDERS = ("z", "z-trans", "hilbert", "hilbert-trans")


def _brute_force(q, k, v, batch, valid, patch, scale):
    n, h, d = q.shape
    out = np.zeros_like(v)
    for p in range(n // patch):
        sl = slice(p * patch, (p + 1) * patch)
        qb, kb, vb = q[sl], k[sl], v[sl]
        bb, mb = batch[sl], valid[sl]
        for i in range(patch):
            allowed = (bb == bb[i]) & mb
            if not allowed.any():
                continue
            for hh in range(h):
                logits = (qb[i, hh] @ kb[allowed, hh].T) * scale
                w = np.exp(logits - logits.max())
                w = w / w.sum()
                out[p * patch + i, hh] = w @ vb[allowed, hh]
    return out


def test_patch_attention_matches_bruteforce(rng):
    pt = synthetic_batch(rng, counts=(100, 60), num_points=192)
    pt = serialize(pt, orders=ORDERS, shuffle_key=None)
    n, h, d, patch = 192, 2, 8, 64
    q = rng.randn(n, h, d).astype(np.float32)
    k = rng.randn(n, h, d).astype(np.float32)
    v = rng.randn(n, h, d).astype(np.float32)
    order = np.asarray(pt.orders[0])
    bs = np.asarray(pt.batch)[order]
    ms = np.asarray(pt.mask)[order]
    scale = d**-0.5
    got = np.asarray(
        patch_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(bs), jnp.asarray(ms), patch, scale,
        )
    )
    want = _brute_force(q, k, v, bs, ms, patch, scale)
    valid_rows = ms
    np.testing.assert_allclose(got[valid_rows], want[valid_rows], rtol=2e-4, atol=2e-5)


def test_patch_attention_no_cross_scene_leak(rng):
    """Perturbing scene 1 features must not change scene 0 outputs."""
    pt = synthetic_batch(rng, counts=(100, 60), num_points=192)
    pt = serialize(pt, orders=ORDERS, shuffle_key=None)
    n, h, d, patch = 192, 2, 8, 64
    q = rng.randn(n, h, d).astype(np.float32)
    k = rng.randn(n, h, d).astype(np.float32)
    v = rng.randn(n, h, d).astype(np.float32)
    order = np.asarray(pt.orders[0])
    bs = np.asarray(pt.batch)[order]
    ms = np.asarray(pt.mask)[order]
    run = lambda vv: np.asarray(
        patch_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(vv),
            jnp.asarray(bs), jnp.asarray(ms), patch, d**-0.5,
        )
    )
    a = run(v)
    v2 = v.copy()
    v2[bs == 1] += 100.0
    b = run(v2)
    np.testing.assert_allclose(a[bs == 0], b[bs == 0], rtol=1e-5, atol=1e-6)
    assert np.abs(a[bs == 1] - b[bs == 1]).max() > 1.0


def test_cross_attention_shapes_and_masking(rng):
    pt = synthetic_batch(rng, counts=(100, 60), num_points=192)
    pt = serialize(pt, orders=ORDERS, shuffle_key=None)
    n, h, d, patch = 192, 2, 8, 64
    q = rng.randn(n, h, d).astype(np.float32)
    k = rng.randn(n, h, d).astype(np.float32)
    v = rng.randn(n, h, d).astype(np.float32)
    order = np.asarray(pt.orders[0])
    bs = jnp.asarray(np.asarray(pt.batch)[order])
    ms = jnp.asarray(np.asarray(pt.mask)[order])
    out = cross_patch_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        bs, ms, bs, ms, patch, patch, d**-0.5,
    )
    assert out.shape == (n, h, d)
    # same point set + same patching => must equal self patch attention
    self_out = patch_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), bs, ms, patch, d**-0.5
    )
    np.testing.assert_allclose(
        np.asarray(out)[np.asarray(ms)], np.asarray(self_out)[np.asarray(ms)],
        rtol=2e-4, atol=2e-5,
    )
