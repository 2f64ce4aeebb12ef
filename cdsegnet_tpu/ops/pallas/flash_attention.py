"""Fused masked patch attention — Pallas TPU kernel.

The TPU replacement for the reference's `flash_attn_varlen_qkvpacked_func`
(`point_transformer_v3m1_base.py:282-289`). After serialization-sort the
patch structure is static: N = P * K points, every patch is a contiguous
window, and masking is "same scene id AND valid". For K = 1024, the full
(K, K) score tile fits in VMEM, so the kernel computes logits -> masked
softmax -> weighted sum entirely on-chip per (patch, head) grid cell; the
K x K attention matrix never touches HBM (the XLA fallback materializes
P*H*K*K scores — hundreds of MB per layer at full resolution).

Forward-only kernel with a custom VJP whose backward recomputes scores via
the XLA einsum path (correct, HBM-bound); a fused Pallas backward is the
next optimization step.
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


def _attn_kernel(b_ref, m_ref, q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0, 0].astype(jnp.float32)  # (K, D)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q * jnp.float32(scale), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
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
    o_ref[0, 0] = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
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


def _call(grid, bblk, blk, p, h, kk, d, scale, interpret, bp, mp, qp, kp, vp,
          out_dtype, n):
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
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
                     dq_ref, dk_ref, dv_ref, *, scale):
    """Fused backward: recompute masked softmax in VMEM, emit dq/dk/dv."""
    f32 = jnp.float32
    q = q_ref[0, 0].astype(f32)
    k = k_ref[0, 0].astype(f32)
    v = v_ref[0, 0].astype(f32)
    g = g_ref[0, 0].astype(f32)
    s = jax.lax.dot_general(
        q * jnp.float32(scale), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )
    b = b_ref[0, 0]
    valid = m_ref[0, 0]
    allowed = (b[:, None] == b[None, :]) & (valid[None, :] > 0)
    s = jnp.where(allowed, s, jnp.float32(NEG))
    mx = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - mx)
    den = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), jnp.float32(1e-20))
    p = e / den  # (K, K)
    # dV = P^T g
    dv_ref[0, 0] = jax.lax.dot_general(
        p, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    ).astype(dv_ref.dtype)
    # dP = g V^T ; ds = P * (dP - rowsum(dP * P))
    dp = jax.lax.dot_general(
        g, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    # dQ = ds K * scale ; dK = ds^T Q * scale
    dq_ref[0, 0] = (
        jax.lax.dot_general(
            ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        * jnp.float32(scale)
    ).astype(dq_ref.dtype)
    dk_ref[0, 0] = (
        jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        * jnp.float32(scale)
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
            functools.partial(_attn_bwd_kernel, scale=scale),
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
