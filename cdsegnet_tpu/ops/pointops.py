"""Neighborhood ops: the TPU equivalents of the reference CUDA `libs/pointops`.

Reference kernels (`libs/pointops/src/*`, python wrappers
`libs/pointops/functions/*`): kNN query (heap per query thread), ball query,
farthest point sampling, grouping, 3-NN interpolation. Here each is an XLA
program over static masked shapes:

- kNN / ball query: chunked dense distance tiles + `lax.top_k` — the MXU
  computes the |q|^2 - 2 q.r + |r|^2 expansion as a matmul; no per-point
  heaps.
- FPS: `lax.fori_loop` over samples with a running min-distance array.
- grouping / interpolation: pure gathers + arithmetic.

Used by the evaluator's grid-to-origin remap (reference
`engines/hooks/evaluator.py:132-141`) and by the PTv1/PTv2 model families.
All functions take explicit validity masks; invalid rows yield index N
(a guard row) and infinite distance.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

BIG = 1e30


def _pairwise_dist2(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Squared distances (M, N) via the matmul expansion (MXU-friendly)."""
    qq = jnp.sum(q * q, axis=-1, keepdims=True)  # (M, 1)
    rr = jnp.sum(r * r, axis=-1)[None, :]  # (1, N)
    cross = q @ r.T  # (M, N) on the MXU
    return jnp.maximum(qq - 2.0 * cross + rr, 0.0)


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    k: int,
    query_mask: Optional[jnp.ndarray] = None,
    ref_mask: Optional[jnp.ndarray] = None,
    chunk: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest references for each query -> (idx (M,k), dist2 (M,k)).

    Invalid references never match; invalid queries return index N.
    """
    m, n = query.shape[0], ref.shape[0]
    pad = (-m) % chunk
    qp = jnp.pad(query, ((0, pad), (0, 0)))
    qm = (
        jnp.pad(query_mask, (0, pad)) if query_mask is not None
        else jnp.pad(jnp.ones((m,), bool), (0, pad))
    )
    rmask = ref_mask if ref_mask is not None else jnp.ones((n,), bool)
    rbad = jnp.where(rmask, 0.0, BIG)[None, :]

    def body(qc):
        d2 = _pairwise_dist2(qc, ref) + rbad
        neg, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32), -neg

    qcs = qp.reshape(-1, chunk, 3)
    idxs, dists = jax.lax.map(body, qcs)
    idx = idxs.reshape(-1, k)[:m]
    dist = dists.reshape(-1, k)[:m]
    qmask = qm[:m]
    idx = jnp.where(qmask[:, None], idx, n)
    dist = jnp.where(qmask[:, None], dist, BIG)
    return idx, dist


@functools.partial(jax.jit, static_argnames=("nsample", "chunk"))
def ball_query(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    radius: float,
    nsample: int,
    query_mask: Optional[jnp.ndarray] = None,
    ref_mask: Optional[jnp.ndarray] = None,
    chunk: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Up to ``nsample`` references within ``radius``; short lists repeat the
    nearest neighbor (reference ball-query semantics)."""
    idx, dist = knn(query, ref, nsample, query_mask, ref_mask, chunk)
    inside = dist <= radius * radius
    first = idx[:, :1]
    idx = jnp.where(inside, idx, jnp.broadcast_to(first, idx.shape))
    dist = jnp.where(inside, dist, jnp.broadcast_to(dist[:, :1], dist.shape))
    return idx, dist


@functools.partial(jax.jit, static_argnames=("n_samples",))
def farthest_point_sampling(
    coord: jnp.ndarray,
    n_samples: int,
    mask: Optional[jnp.ndarray] = None,
    start: int = 0,
) -> jnp.ndarray:
    """Iterative FPS -> (n_samples,) indices (reference `src/sampling`)."""
    n = coord.shape[0]
    valid = mask if mask is not None else jnp.ones((n,), bool)
    bad = jnp.where(valid, 0.0, BIG)

    def body(i, carry):
        mind, sel = carry
        last = sel[i - 1]
        d = jnp.sum((coord - coord[last]) ** 2, axis=-1)
        mind = jnp.minimum(mind, d)
        nxt = jnp.argmax(jnp.where(valid, mind, -BIG))
        sel = sel.at[i].set(nxt.astype(jnp.int32))
        return mind, sel

    sel0 = jnp.zeros((n_samples,), jnp.int32).at[0].set(start)
    mind0 = jnp.full((n,), BIG) + bad * 0
    _, sel = jax.lax.fori_loop(1, n_samples, body, (mind0, sel0))
    return sel


def grouping(feat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather neighbor features -> (M, k, C); index N reads zeros
    (reference `src/grouping`)."""
    return jnp.take(feat, idx, axis=0, mode="fill", fill_value=0)


@jax.jit
def three_interpolation(
    target_coord: jnp.ndarray,
    source_coord: jnp.ndarray,
    source_feat: jnp.ndarray,
    target_mask: Optional[jnp.ndarray] = None,
    source_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Inverse-distance-weighted 3-NN interpolation (reference
    `src/interpolation`)."""
    idx, d2 = knn(target_coord, source_coord, 3, target_mask, source_mask)
    w = 1.0 / jnp.maximum(d2, 1e-8)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    neigh = grouping(source_feat, idx)  # (M, 3, C)
    return jnp.sum(neigh * w[..., None].astype(source_feat.dtype), axis=1)


def knn_remap_labels(
    origin_coord: jnp.ndarray,
    sampled_coord: jnp.ndarray,
    sampled_pred: jnp.ndarray,
    origin_mask: Optional[jnp.ndarray] = None,
    sampled_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """1-NN label transfer from grid-sampled points to original points
    (the evaluator remap, reference `hooks/evaluator.py:132-141`)."""
    idx, _ = knn(origin_coord, sampled_coord, 1, origin_mask, sampled_mask)
    guard = jnp.concatenate([sampled_pred, jnp.zeros((1,), sampled_pred.dtype)])
    return jnp.take(guard, idx[:, 0])
