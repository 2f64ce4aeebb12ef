"""Serialized patch attention (masked, static-shape) — XLA reference path.

The reference runs flash varlen attention over per-scene padded patches
(`point_transformer_v3m1_base.py:246-296`). Here every level keeps one flat
sorted array, reshaped to ``(num_patches, patch_size)``; cross-scene and
padding keys are masked out by an additive bias, which subsumes the
reference's pad/unpad index machinery.

`patch_attention` is the einsum (XLA) implementation used for testing and as
autodiff fallback; `cdsegnet_tpu.ops.pallas.flash_attention` provides the
fused Pallas TPU kernel with identical semantics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def _precision(dtype):
    # f32 inputs get true-f32 matmuls; bf16 inputs use fast MXU passes with
    # f32 accumulation (via preferred_element_type).
    return "highest" if dtype == jnp.float32 else None


def patch_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    batch_sorted: jnp.ndarray,
    valid_sorted: jnp.ndarray,
    patch_size: int,
    scale: float,
    bias: Optional[jnp.ndarray] = None,
    upcast_softmax: bool = True,
) -> jnp.ndarray:
    """Masked patch attention over serialized order.

    Args:
      q, k, v: (N, H, D) arrays in serialized order.
      batch_sorted: (N,) int32 scene ids in serialized order (pads carry the
        sentinel id).
      valid_sorted: (N,) bool validity in serialized order.
      patch_size: static window size K; N must be a multiple of K.
      scale: softmax scale (usually D**-0.5).
      bias: optional (P, H, K, K) additive attention bias (e.g. RPE).
      upcast_softmax: accumulate logits/softmax in float32.

    Returns:
      (N, H, D) attention output in serialized order, dtype of ``v``.
    """
    n, h, d = q.shape
    assert n % patch_size == 0, (n, patch_size)
    p = n // patch_size
    qp = q.reshape(p, patch_size, h, d)
    kp = k.reshape(p, patch_size, h, d)
    vp = v.reshape(p, patch_size, h, d)
    bp = batch_sorted.reshape(p, patch_size)
    mp = valid_sorted.reshape(p, patch_size)

    acc_t = jnp.float32 if upcast_softmax else q.dtype
    logits = jnp.einsum(
        "pihd,pjhd->phij", qp, kp,
        preferred_element_type=acc_t, precision=_precision(q.dtype),
    ) * jnp.asarray(scale, acc_t)
    if bias is not None:
        logits = logits + bias.astype(acc_t)
    allowed = (bp[:, :, None] == bp[:, None, :]) & mp[:, None, :]
    logits = jnp.where(allowed[:, None, :, :], logits, jnp.asarray(NEG_INF, acc_t))
    probs = jax.nn.softmax(logits, axis=-1).astype(vp.dtype)
    out = jnp.einsum(
        "phij,pjhd->pihd", probs, vp, precision=_precision(vp.dtype)
    )
    return out.reshape(n, h, d)


def cross_patch_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_batch_sorted: jnp.ndarray,
    q_valid_sorted: jnp.ndarray,
    kv_batch_sorted: jnp.ndarray,
    kv_valid_sorted: jnp.ndarray,
    q_patch_size: int,
    kv_patch_size: int,
    scale: float,
    upcast_softmax: bool = True,
) -> jnp.ndarray:
    """Masked cross attention between two serialized point sets.

    Queries come from one branch, keys/values from the other; both are in
    their own serialized orders, windowed into patches
    (``q``: (Nq, H, D) -> (P, Kq, H, D); ``kv``: (Nkv, H, D) -> (P, Kkv, H,
    D); P must match — the reference guarantees this by using the *query*
    padding for both sides (`point_transformer_v3m1_base.py:1004-1011`), and
    in CDSegNet the two branches share the identical point set at the fusion
    level, so we require Nq == Nkv when patch sizes are equal.
    """
    nq, h, d = q.shape
    nk = k.shape[0]
    pq = nq // q_patch_size
    pk = nk // kv_patch_size
    assert pq == pk, (pq, pk)
    qp = q.reshape(pq, q_patch_size, h, d)
    kp = k.reshape(pq, kv_patch_size, h, d)
    vp = v.reshape(pq, kv_patch_size, h, d)
    qb = q_batch_sorted.reshape(pq, q_patch_size)
    kb = kv_batch_sorted.reshape(pq, kv_patch_size)
    kv_ok = kv_valid_sorted.reshape(pq, kv_patch_size)

    acc_t = jnp.float32 if upcast_softmax else q.dtype
    logits = jnp.einsum(
        "pihd,pjhd->phij", qp, kp,
        preferred_element_type=acc_t, precision=_precision(q.dtype),
    ) * jnp.asarray(scale, acc_t)
    allowed = (qb[:, :, None] == kb[:, None, :]) & kv_ok[:, None, :]
    logits = jnp.where(allowed[:, None, :, :], logits, jnp.asarray(NEG_INF, acc_t))
    probs = jax.nn.softmax(logits, axis=-1)
    # A query patch whose scene has no kv keys in the aligned window would get
    # a uniform distribution over masked slots; zero it instead.
    any_ok = jnp.any(allowed, axis=-1)  # (P, Kq)
    probs = jnp.where(any_ok[:, None, :, None], probs, 0.0).astype(vp.dtype)
    out = jnp.einsum(
        "phij,pjhd->pihd", probs, vp, precision=_precision(vp.dtype)
    )
    return out.reshape(nq, h, d)
