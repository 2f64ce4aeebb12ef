"""Pallas fused attention vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from cdsegnet_tpu.models.structure import serialize
from cdsegnet_tpu.ops.attention import patch_attention
from cdsegnet_tpu.ops.pallas.flash_attention import flash_patch_attention
from helpers import synthetic_batch

ORDERS = ("z", "z-trans", "hilbert", "hilbert-trans")


def _setup(rng, n=256, h=2, d=16, patch=128):
    pt = synthetic_batch(rng, counts=(150, 80), num_points=n, depth=6)
    pt = serialize(pt, orders=ORDERS, shuffle_key=None)
    q = rng.randn(n, h, d).astype(np.float32)
    k = rng.randn(n, h, d).astype(np.float32)
    v = rng.randn(n, h, d).astype(np.float32)
    order = np.asarray(pt.orders[0])
    bs = np.asarray(pt.batch)[order]
    ms = np.asarray(pt.mask)[order]
    return map(jnp.asarray, (q, k, v, bs, ms)), patch, d**-0.5, ms


def test_pallas_matches_xla(rng):
    (q, k, v, bs, ms), patch, scale, valid = _setup(rng)
    want = patch_attention(q, k, v, bs, ms, patch, scale)
    got = flash_patch_attention(q, k, v, bs, ms, patch, scale, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(want)[valid], rtol=2e-4, atol=2e-5
    )


def test_pallas_backward_matches_xla(rng):
    (q, k, v, bs, ms), patch, scale, valid = _setup(rng, n=256, patch=64)

    def loss_ref(q, k, v):
        o = patch_attention(q, k, v, bs, ms, patch, scale)
        return jnp.sum(jnp.where(jnp.asarray(valid)[:, None, None], o, 0.0) ** 2)

    def loss_pl(q, k, v):
        o = flash_patch_attention(q, k, v, bs, ms, patch, scale, interpret=True)
        return jnp.sum(jnp.where(jnp.asarray(valid)[:, None, None], o, 0.0) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_pl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)
