"""Fused masked patch attention — Pallas TPU kernel.

The TPU replacement for the reference's `flash_attn_varlen_qkvpacked_func`
(`point_transformer_v3m1_base.py:282-289`). After serialization-sort the
patch structure is static: N = P * K points, every patch is a contiguous
window, and masking is "same scene id AND valid". For K = 1024, the full
(K, K) score tile fits in VMEM, so the kernel computes logits -> masked
softmax -> weighted sum entirely on-chip per (patch, head) grid cell; the
K x K attention matrix never touches HBM (the XLA fallback materializes
P*H*K*K scores — hundreds of MB per layer at full resolution).

Custom VJP with a fused Pallas backward that recomputes the masked softmax
in VMEM and emits dq/dk/dv in one pass. Matmul precision mirrors the XLA
path: near-f32 (hand-rolled bf16 hi/lo split, see `_dot`/`_split_for`) for
f32 inputs, fast bf16 MXU passes for bf16 —
`bench.check_pallas_parity` asserts on-chip agreement every bench run.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cdsegnet_tpu.ops.attention import patch_attention

NEG = -1e30


def _dot(a, b, dims, split):
    d = lambda x, y: jax.lax.dot_general(
        x, y, dims, preferred_element_type=jnp.float32
    )
    if not split:
        return d(a, b)
    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
    return d(a_hi, b_hi) + d(a_hi, b - b_hi) + d(a - a_hi, b_hi)


def _attn_kernel(b_ref, m_ref, q_ref, k_ref, v_ref, o_ref, *, scale,
                 split=False):
    q = q_ref[0, 0].astype(jnp.float32)  # (K, D)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0]
    s = _dot(
        q * jnp.float32(scale), k, (((1,), (1,)), ((), ())), split
    )  # (K, K)
    b = b_ref[0, 0]  # (K,) int32 scene ids
    valid = m_ref[0, 0]  # (K,) int32 0/1
    allowed = (b[:, None] == b[None, :]) & (valid[None, :] > 0)
    s = jnp.where(allowed, s, jnp.float32(NEG))
    mx = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - mx)
    den = jnp.maximum(
        jnp.sum(e, axis=-1, keepdims=True), jnp.float32(1e-20)
    )
    p = (e / den).astype(v.dtype)
    o_ref[0, 0] = _dot(
        p, v, (((1,), (0,)), ((), ())), split
    ).astype(o_ref.dtype)


def _flash_fwd(q, k, v, batch_sorted, valid_sorted, patch_size, scale, interpret):
    n, h, d = q.shape
    p = n // patch_size
    kk = patch_size
    qp = q.reshape(p, kk, h, d).transpose(0, 2, 1, 3)  # (P, H, K, D)
    kp = k.reshape(p, kk, h, d).transpose(0, 2, 1, 3)
    vp = v.reshape(p, kk, h, d).transpose(0, 2, 1, 3)
    bp = batch_sorted.reshape(p, 1, kk).astype(jnp.int32)
    mp = valid_sorted.reshape(p, 1, kk).astype(jnp.int32)

    grid = (p, h)
    blk = lambda: pl.BlockSpec(
        (1, 1, kk, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    bblk = pl.BlockSpec(
        (1, 1, kk), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    # The framework enables x64 globally (serialization codes are int64), but
    # Mosaic cannot legalize the i64 trace-time constants that x64 injects
    # into grid index maps; all kernel operands are <=32-bit, so trace the
    # pallas_call with x64 off.
    with jax.enable_x64(False):
        return _call(grid, bblk, blk, p, h, kk, d, scale, interpret,
                     bp, mp, qp, kp, vp, v.dtype, n)


def _split_for(dtype):
    # match the XLA path's policy (`ops/attention._precision`): near-f32
    # matmuls for f32 inputs, fast bf16 MXU passes otherwise. Without this,
    # f32 callers silently get bf16-truncated scores (measured 3.7e-3 max
    # abs divergence on chip at K=512). `precision=HIGHEST` inside a Pallas
    # dot HANGS this image's Mosaic compile, so the multi-pass form is
    # hand-rolled in `_dot` (3 DEFAULT-precision passes over a bf16
    # hi/lo split — ~2^-16 relative product error, f32 accumulation).
    return dtype == jnp.float32


def _call(grid, bblk, blk, p, h, kk, d, scale, interpret, bp, mp, qp, kp, vp,
          out_dtype, n):
    out = pl.pallas_call(
        functools.partial(
            _attn_kernel, scale=scale, split=_split_for(out_dtype)
        ),
        grid=grid,
        in_specs=[bblk, bblk, blk(), blk(), blk()],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct((p, h, kk, d), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * kk * kk * d * p * h,
            bytes_accessed=(3 * kk * d * 2 + kk * d * 2) * p * h,
            transcendentals=kk * kk * p * h,
        ),
    )(bp, mp, qp, kp, vp)
    return out.transpose(0, 2, 1, 3).reshape(n, h, d)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8)
)
def flash_patch_attention(
    q, k, v, batch_sorted, valid_sorted, patch_size, scale,
    upcast_softmax=True, interpret=False,
):
    """Drop-in replacement for `patch_attention` (same contract)."""
    return _flash_fwd(
        q, k, v, batch_sorted, valid_sorted, patch_size, scale, interpret
    )


def _fwd(q, k, v, batch_sorted, valid_sorted, patch_size, scale,
         upcast_softmax, interpret):
    out = _flash_fwd(
        q, k, v, batch_sorted, valid_sorted, patch_size, scale, interpret
    )
    return out, (q, k, v, batch_sorted, valid_sorted)


def _attn_bwd_kernel(b_ref, m_ref, q_ref, k_ref, v_ref, g_ref,
                     dq_ref, dk_ref, dv_ref, *, scale, split=False):
    """Fused backward: recompute masked softmax in VMEM, emit dq/dk/dv."""
    f32 = jnp.float32
    q = q_ref[0, 0].astype(f32)
    k = k_ref[0, 0].astype(f32)
    v = v_ref[0, 0].astype(f32)
    g = g_ref[0, 0].astype(f32)
    s = _dot(q * jnp.float32(scale), k, (((1,), (1,)), ((), ())), split)
    b = b_ref[0, 0]
    valid = m_ref[0, 0]
    allowed = (b[:, None] == b[None, :]) & (valid[None, :] > 0)
    s = jnp.where(allowed, s, jnp.float32(NEG))
    mx = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - mx)
    den = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), jnp.float32(1e-20))
    p = e / den  # (K, K)
    # dV = P^T g
    dv_ref[0, 0] = _dot(
        p, g, (((0,), (0,)), ((), ())), split
    ).astype(dv_ref.dtype)
    # dP = g V^T ; ds = P * (dP - rowsum(dP * P))
    dp = _dot(g, v, (((1,), (1,)), ((), ())), split)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    # dQ = ds K * scale ; dK = ds^T Q * scale
    dq_ref[0, 0] = (
        _dot(ds, k, (((1,), (0,)), ((), ())), split) * jnp.float32(scale)
    ).astype(dq_ref.dtype)
    dk_ref[0, 0] = (
        _dot(ds, q, (((0,), (0,)), ((), ())), split) * jnp.float32(scale)
    ).astype(dk_ref.dtype)


def _bwd(patch_size, scale, upcast_softmax, interpret, res, g):
    q, k, v, batch_sorted, valid_sorted = res
    n, h, d = q.shape
    p = n // patch_size
    kk = patch_size
    to_p = lambda x: x.reshape(p, kk, h, d).transpose(0, 2, 1, 3)
    qp, kp, vp, gp = to_p(q), to_p(k), to_p(v), to_p(g)
    bp = batch_sorted.reshape(p, 1, kk).astype(jnp.int32)
    mp = valid_sorted.reshape(p, 1, kk).astype(jnp.int32)
    blk = lambda: pl.BlockSpec(
        (1, 1, kk, d), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    bblk = pl.BlockSpec(
        (1, 1, kk), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    with jax.enable_x64(False):
        dq, dk, dv = pl.pallas_call(
            functools.partial(
                _attn_bwd_kernel, scale=scale, split=_split_for(q.dtype),
            ),
            grid=(p, h),
            in_specs=[bblk, bblk, blk(), blk(), blk(), blk()],
            out_specs=(blk(), blk(), blk()),
            out_shape=(
                jax.ShapeDtypeStruct((p, h, kk, d), q.dtype),
                jax.ShapeDtypeStruct((p, h, kk, d), k.dtype),
                jax.ShapeDtypeStruct((p, h, kk, d), v.dtype),
            ),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=10 * kk * kk * d * p * h,
                bytes_accessed=(4 * kk * d * 2 + 3 * kk * d * 2) * p * h,
                transcendentals=kk * kk * p * h,
            ),
        )(bp, mp, qp, kp, vp, gp)
    back = lambda x: x.transpose(0, 2, 1, 3).reshape(n, h, d)
    return back(dq), back(dk), back(dv), None, None


flash_patch_attention.defvjp(_fwd, _bwd)


def attention_impl(use_pallas: Optional[bool] = None):
    """Pick the attention implementation; Pallas on TPU by default."""
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    return flash_patch_attention if use_pallas else patch_attention
