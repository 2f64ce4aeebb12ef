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
    query_batch: Optional[jnp.ndarray] = None,
    ref_batch: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest references for each query -> (idx (M,k), dist2 (M,k)).

    Invalid references never match; invalid queries return index N. When
    ``query_batch``/``ref_batch`` scene ids are given, neighbors never cross
    scenes (the reference CUDA kNN's per-offset semantics,
    `libs/pointops/src/knn_query`). Any slot that found no valid in-scene
    reference (scene smaller than k) returns index N / distance BIG.
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

    if query_batch is not None:
        qb = jnp.pad(query_batch.astype(jnp.int32), (0, pad),
                     constant_values=-1)
        rb = ref_batch.astype(jnp.int32)[None, :]

        def body(args):
            qc, qbc = args
            d2 = _pairwise_dist2(qc, ref) + rbad
            d2 = jnp.where(qbc[:, None] == rb, d2, BIG)
            neg, idx = jax.lax.top_k(-d2, k)
            return idx.astype(jnp.int32), -neg

        idxs, dists = jax.lax.map(
            body, (qp.reshape(-1, chunk, 3), qb.reshape(-1, chunk))
        )
    else:

        def body(qc):
            d2 = _pairwise_dist2(qc, ref) + rbad
            neg, idx = jax.lax.top_k(-d2, k)
            return idx.astype(jnp.int32), -neg

        idxs, dists = jax.lax.map(body, qp.reshape(-1, chunk, 3))
    idx = idxs.reshape(-1, k)[:m]
    dist = dists.reshape(-1, k)[:m]
    qmask = qm[:m]
    # slots whose best candidate was itself invalid (masked ref or another
    # scene) point at the guard row
    idx = jnp.where(qmask[:, None] & (dist < 0.5 * BIG), idx, n)
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


@functools.partial(
    jax.jit, static_argnames=("n_samples", "stride", "num_scenes")
)
def farthest_point_sampling_batched(
    coord: jnp.ndarray,
    batch: jnp.ndarray,
    mask: jnp.ndarray,
    n_samples: int,
    stride: int,
    num_scenes: int,
) -> jnp.ndarray:
    """Per-scene FPS at ``stride``: scene s contributes ``count_s // stride``
    samples, exactly the reference TransitionDown contract
    (`point_transformer_seg.py:93-116`: per-offset `n_o` quotas +
    `pointops.farthest_point_sampling`).

    One `fori_loop` drives every scene at once: scene updates never interact
    (min-distance updates are masked to the picked point's scene), so the
    interleaved global argmax yields each scene's independent FPS set. Each
    scene is seeded by its first valid point in packed order (the reference
    starts at the offset start). Returns ``(n_samples,)`` indices into
    ``coord``; unused slots are N.
    """
    n = coord.shape[0]
    coord = coord.astype(jnp.float32)
    b = jnp.where(mask, batch.astype(jnp.int32), num_scenes)
    counts = jnp.zeros((num_scenes + 1,), jnp.int32).at[b].add(1)
    quota = counts[:num_scenes] // stride
    quota = jnp.where(counts[:num_scenes] > 0, jnp.maximum(quota, 1), 0)
    quota_ext = jnp.concatenate([quota, jnp.zeros((1,), jnp.int32)])

    def body(t, carry):
        mind, chosen, taken, sel = carry
        eligible = (~chosen) & (taken[b] < quota_ext[b])
        score = jnp.where(eligible, mind, -1.0)
        pick = jnp.argmax(score).astype(jnp.int32)
        ok = score[pick] >= 0.0  # >=: coincident points (mind 0) still count
        pb = b[pick]
        d = jnp.sum(jnp.square(coord - coord[pick]), axis=-1)
        mind = jnp.where(ok & (b == pb), jnp.minimum(mind, d), mind)
        chosen = chosen.at[pick].set(chosen[pick] | ok)
        taken = taken.at[pb].add(jnp.where(ok, 1, 0))
        sel = sel.at[t].set(jnp.where(ok, pick, n))
        return mind, chosen, taken, sel

    carry = (
        jnp.full((n,), BIG, jnp.float32),
        jnp.zeros((n,), bool),
        jnp.zeros((num_scenes + 1,), jnp.int32),
        jnp.full((n_samples,), n, jnp.int32),
    )
    _, _, _, sel = jax.lax.fori_loop(0, n_samples, body, carry)
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
    target_batch: Optional[jnp.ndarray] = None,
    source_batch: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Inverse-distance-weighted 3-NN interpolation (reference
    `src/interpolation`)."""
    idx, d2 = knn(target_coord, source_coord, 3, target_mask, source_mask,
                  query_batch=target_batch, ref_batch=source_batch)
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
