"""Sorted-segment reductions: the TPU equivalent of `torch_scatter.segment_csr`.

The reference pools serialized point clouds by `torch.unique` + CSR segment
reduce (`point_transformer_v3m1_base.py:477-531`). Here clusters are derived
from the *sorted* codes by a boundary cumsum, and reductions use
`jax.ops.segment_*` with ``indices_are_sorted=True`` so XLA lowers them to a
single scan — no dynamic `unique` anywhere, output capacity is static.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def sorted_segment_ids(keys_sorted: jnp.ndarray) -> jnp.ndarray:
    """Segment index per sorted position: 0,0,1,1,1,2,... for equal-key runs."""
    boundary = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), (keys_sorted[1:] != keys_sorted[:-1]).astype(jnp.int32)]
    )
    return jnp.cumsum(boundary) - 1


def segment_reduce(
    values_sorted: jnp.ndarray,
    seg_ids: jnp.ndarray,
    num_segments: int,
    reduce: str = "max",
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Reduce ``values_sorted`` over sorted segment ids with static capacity.

    Invalid rows (``valid=False``) never contribute; empty segments yield 0.
    """
    if valid is not None:
        if reduce == "max":
            neutral = jnp.asarray(jnp.finfo(values_sorted.dtype).min, values_sorted.dtype)
            values_sorted = jnp.where(_bc(valid, values_sorted), values_sorted, neutral)
        elif reduce == "min":
            neutral = jnp.asarray(jnp.finfo(values_sorted.dtype).max, values_sorted.dtype)
            values_sorted = jnp.where(_bc(valid, values_sorted), values_sorted, neutral)
        else:
            values_sorted = jnp.where(_bc(valid, values_sorted), values_sorted, 0)
    if reduce == "max":
        out = jax.ops.segment_max(
            values_sorted, seg_ids, num_segments, indices_are_sorted=True
        )
        out = jnp.where(jnp.isfinite(out.astype(jnp.float32)), out, 0)
        if valid is not None:
            has = segment_any(valid, seg_ids, num_segments)
            out = jnp.where(_bc(has, out), out, 0)
    elif reduce == "min":
        out = jax.ops.segment_min(
            values_sorted, seg_ids, num_segments, indices_are_sorted=True
        )
        out = jnp.where(jnp.isfinite(out.astype(jnp.float32)), out, 0)
        if valid is not None:
            has = segment_any(valid, seg_ids, num_segments)
            out = jnp.where(_bc(has, out), out, 0)
    elif reduce == "sum":
        out = jax.ops.segment_sum(
            values_sorted, seg_ids, num_segments, indices_are_sorted=True
        )
    elif reduce == "mean":
        s = jax.ops.segment_sum(
            values_sorted, seg_ids, num_segments, indices_are_sorted=True
        )
        ones = jnp.ones(values_sorted.shape[:1], values_sorted.dtype)
        if valid is not None:
            ones = jnp.where(valid, ones, 0)
        cnt = jax.ops.segment_sum(ones, seg_ids, num_segments, indices_are_sorted=True)
        out = s / jnp.maximum(cnt, 1)[(...,) + (None,) * (s.ndim - 1)]
    else:
        raise ValueError(reduce)
    return out


def segment_any(
    valid: jnp.ndarray, seg_ids: jnp.ndarray, num_segments: int
) -> jnp.ndarray:
    return (
        jax.ops.segment_max(
            valid.astype(jnp.int32), seg_ids, num_segments, indices_are_sorted=True
        )
        > 0
    )


def segment_first_position(
    seg_ids: jnp.ndarray, num_segments: int
) -> jnp.ndarray:
    """First sorted position of each segment (its 'head'); 0 for empty ones."""
    n = seg_ids.shape[0]
    pos = jnp.arange(n, dtype=jnp.int32)
    return jax.ops.segment_min(
        jnp.minimum(pos, n - 1), seg_ids, num_segments, indices_are_sorted=True
    ).clip(0, n - 1)


def _bc(valid: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    return valid.reshape(valid.shape + (1,) * (ref.ndim - valid.ndim))
