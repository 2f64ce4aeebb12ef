"""Static-shape batched point-cloud structure (TPU-native `Point`).

The reference keeps ragged per-scene point clouds concatenated with an
`offset` vector and re-derives padding/inverse maps per attention layer with a
Python loop over scenes (`point_transformer_v3m1_base.py:189-244`,
`structure.py:14-181`). On TPU everything must be static-shaped, so we invert
the design:

- A batch is a flat array of ``num_points`` slots (a static bucket size).
  Real points occupy a prefix of each scene's slots; unused slots are marked
  ``mask=False`` and carry a sentinel batch id (``num_scenes``), which makes
  them sort to the global end of every serialization order.
- Serialization codes put the (sentinel-aware) batch id in the high bits, so
  sorting groups scenes contiguously; attention layers then simply reshape the
  sorted arrays into ``(num_patches, patch_size)`` windows and mask keys by
  batch equality + validity. No per-scene pad/unpad indexing exists anywhere.
- Submanifold-conv neighbor tables (the TPU equivalent of spconv hash tables,
  reference `structure.py:104-140`) are built once per resolution level from
  the z-order codes by binary search, and reused by every block of the level.

All arrays live on device; every op here is jit-compatible.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp

from cdsegnet_tpu.ops import serialization as ser


@flax.struct.dataclass
class PointBatch:
    """A batch of point clouds with static shapes.

    Attributes:
      coord: (N, 3) float32 world coordinates (zeros at padding).
      grid_coord: (N, 3) int32 voxel coordinates (zeros at padding).
      feat: (N, C) float features.
      mask: (N,) bool — True for real points.
      batch: (N, ) int32 scene index per point; padding slots hold
        ``num_scenes`` (the sentinel).
      segment: optional (N,) int32 labels, -1 = ignore (and at padding).
      codes: (O, N) int64 serialization codes (one row per curve order).
      orders: (O, N) int32 argsort of codes (sorted positions -> point index).
      inverses: (O, N) int32 inverse permutations (point index -> sorted pos).
      depth: static serialization depth (bits per axis).
      num_scenes: static max number of scenes in the batch (sentinel value).
      t_emb: optional (N, T) diffusion timestep embedding carried through the
        noise-network branch (reference `Block.forward`
        `point_transformer_v3m1_base.py:406-411`).
      neighbor_idx: optional (N, K) int32 submanifold-conv neighbor table for
        this level; value N marks a missing neighbor.
    """

    coord: jnp.ndarray
    grid_coord: jnp.ndarray
    feat: jnp.ndarray
    mask: jnp.ndarray
    batch: jnp.ndarray
    segment: Optional[jnp.ndarray] = None
    instance: Optional[jnp.ndarray] = None  # (N,) int32, -1 = no instance
    instance_centroid: Optional[jnp.ndarray] = None  # (N, 3) f32
    codes: Optional[jnp.ndarray] = None
    orders: Optional[jnp.ndarray] = None
    inverses: Optional[jnp.ndarray] = None
    # (O, N) int64 codes in each order's sorted arrangement. A free
    # byproduct of the packed sort (`packed_sort` keeps the key half of the
    # sorted word) that `build_pooled_level` would otherwise re-gather per
    # curve per level (the reference re-sorts codes per branch per level,
    # `point_transformer_v3m1_base.py:492-499`).
    codes_sorted: Optional[jnp.ndarray] = None
    # (O, N) batch ids / validity in each order's sorted arrangement —
    # loop-invariant per level, precomputed once so attention blocks don't
    # re-gather them per block (the scanned stacks cannot CSE the gathers
    # across iterations)
    batch_sorted: Optional[jnp.ndarray] = None
    mask_sorted: Optional[jnp.ndarray] = None
    t_emb: Optional[jnp.ndarray] = None
    neighbor_idx: Optional[jnp.ndarray] = None
    depth: int = flax.struct.field(pytree_node=False, default=16)
    num_scenes: int = flax.struct.field(pytree_node=False, default=1)

    @property
    def num_points(self) -> int:
        return self.coord.shape[0]

    @property
    def batch_eff(self) -> jnp.ndarray:
        """Batch id with the sentinel already applied at padding slots."""
        return self.batch

    def valid_count(self) -> jnp.ndarray:
        return jnp.sum(self.mask)


def make_point_batch(
    coord: jnp.ndarray,
    feat: jnp.ndarray,
    grid_coord: jnp.ndarray,
    batch: jnp.ndarray,
    mask: jnp.ndarray,
    segment: Optional[jnp.ndarray] = None,
    instance: Optional[jnp.ndarray] = None,
    instance_centroid: Optional[jnp.ndarray] = None,
    depth: int = 16,
    num_scenes: int = 1,
) -> PointBatch:
    """Normalize dtypes and apply the padding sentinel convention."""
    mask = mask.astype(bool)
    batch = jnp.where(mask, batch.astype(jnp.int32), jnp.int32(num_scenes))
    return PointBatch(
        coord=jnp.where(mask[:, None], coord.astype(jnp.float32), 0.0),
        grid_coord=jnp.where(mask[:, None], grid_coord.astype(jnp.int32), 0),
        feat=jnp.where(mask[:, None], feat, 0.0).astype(feat.dtype),
        mask=mask,
        batch=batch,
        segment=None
        if segment is None
        else jnp.where(mask, segment.astype(jnp.int32), -1),
        instance=None
        if instance is None
        else jnp.where(mask, instance.astype(jnp.int32), -1),
        instance_centroid=None
        if instance_centroid is None
        else jnp.where(mask[:, None], instance_centroid.astype(jnp.float32), 0.0),
        depth=depth,
        num_scenes=num_scenes,
    )


def assert_unique_voxels(grid_coord, batch, mask, where: str = "") -> None:
    """Host-side check of the GridSample invariant: voxels unique per scene.

    The jitted neighbor-table builds TRUST this invariant (see
    `exact_match_lookup`'s ``max_run`` contract and the mirror halving in
    `build_neighbor_table`); violated, they return silently-missing
    neighbors. An in-jit check would force a `lax.cond` fallback that
    explodes XLA compile time, so the invariant is enforced here, at the
    data boundary: the input pipeline calls this per batch under
    ``CDSEG_VALIDATE=1`` and the test suite calls it on every fixture.
    Raises ``ValueError`` naming the offending scene. No-op on traced
    arguments (cannot run under jit).
    """
    import numpy as np

    if any(isinstance(x, jax.core.Tracer) for x in (grid_coord, batch, mask)):
        return
    gc = np.asarray(grid_coord)
    bt = np.asarray(batch)
    mk = np.asarray(mask).astype(bool)
    rows = np.concatenate([bt[mk, None], gc[mk]], axis=1)
    uniq, counts = np.unique(rows, axis=0, return_counts=True)
    if (counts > 1).any():
        worst = uniq[np.argmax(counts)]
        raise ValueError(
            f"duplicate voxels{' in ' + where if where else ''}: "
            f"{int((counts > 1).sum())} voxel(s) occupied by multiple points "
            f"(worst: scene {worst[0]} voxel {tuple(worst[1:])} x"
            f"{int(counts.max())}). Neighbor tables require unique voxels "
            f"per scene (the GridSample invariant) — deduplicate upstream."
        )


def serialize(
    point: PointBatch,
    orders: Tuple[str, ...] = ("z", "z-trans", "hilbert", "hilbert-trans"),
    shuffle_key: Optional[jax.Array] = None,
) -> PointBatch:
    """Compute per-order codes / sort orders / inverses.

    Mirrors `Point.serialization` (reference `structure.py:47-102`) with the
    padding-sentinel convention: pads carry batch id ``num_scenes`` so they
    sort to the global tail of every order. ``shuffle_key`` permutes the order
    rows like the reference's `shuffle_orders`.
    """
    n = point.num_points
    codes = jnp.stack(
        [
            ser.encode(point.grid_coord, point.batch, depth=point.depth, order=o)
            for o in orders
        ]
    )
    if shuffle_key is not None:
        perm = jax.random.permutation(shuffle_key, len(orders))
        codes = codes[perm]
    key_bits = 3 * point.depth + max((point.num_scenes).bit_length(), 1)
    order, codes_sorted = jax.vmap(lambda c: packed_sort(c, key_bits))(codes)
    arange = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), order.shape)
    inverse = jax.vmap(lambda o, a: jnp.zeros((n,), jnp.int32).at[o].set(a))(
        order, arange
    )
    # batch ids sit in the code's high bits (`ops.serialization.encode`), so
    # the sorted arrangements decode from `codes_sorted` without gathers;
    # pads carry the `num_scenes` sentinel batch by the PointBatch contract.
    batch_sorted = (codes_sorted >> (3 * point.depth)).astype(jnp.int32)
    return point.replace(
        codes=codes, orders=order, inverses=inverse,
        codes_sorted=codes_sorted,
        batch_sorted=batch_sorted,
        mask_sorted=batch_sorted != jnp.int32(point.num_scenes),
    )


# ---------------------------------------------------------------------------
# Packed sorts: TPU sorts pay per key byte AND per payload array, so we pack
# (key, index) into one int64 word and sort a single array.
# ---------------------------------------------------------------------------

_WARNED_PACKED_FALLBACK = False


def packed_argsort(keys: jnp.ndarray, key_bits: int) -> jnp.ndarray:
    """Stable argsort via a single-array sort of ``key << idx_bits | idx``.

    Requires ``key_bits + ceil(log2(n)) <= 63`` and non-negative keys;
    falls back to jnp.argsort otherwise (with a one-time warning — the
    fallback sorts key+payload separately and is measurably slower; it
    means `serialization_depth` is configured deeper than the 63-bit
    budget allows, e.g. 16 instead of the shipped configs' 12).
    """
    n = keys.shape[0]
    idx_bits = (n - 1).bit_length() if n > 1 else 1
    if key_bits + idx_bits > 63:
        global _WARNED_PACKED_FALLBACK
        if not _WARNED_PACKED_FALLBACK:
            _WARNED_PACKED_FALLBACK = True
            import warnings

            warnings.warn(
                f"packed_argsort: key_bits={key_bits} + idx_bits={idx_bits} "
                f"> 63; falling back to plain argsort (slow). Reduce "
                f"serialization depth to restore the packed fast path.",
                stacklevel=2,
            )
        return jnp.argsort(keys, stable=True).astype(jnp.int32)
    packed = (keys.astype(jnp.int64) << idx_bits) | jnp.arange(n, dtype=jnp.int64)
    s = jnp.sort(packed)
    return (s & ((1 << idx_bits) - 1)).astype(jnp.int32)


def packed_sort(
    keys: jnp.ndarray, key_bits: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``(argsort, sorted_keys)`` from ONE packed single-array sort.

    The packed word is ``key << idx_bits | idx`` — after sorting, the low
    bits are the order and the high bits are the sorted keys, so the
    sorted-key array costs one shift instead of the (N,) int64 gather
    ``keys[order]``. Same 63-bit budget and fallback as `packed_argsort`.
    """
    n = keys.shape[0]
    idx_bits = (n - 1).bit_length() if n > 1 else 1
    if key_bits + idx_bits > 63:
        order = packed_argsort(keys, key_bits)  # warns + falls back
        return order, jnp.take(keys, order)
    packed = (keys.astype(jnp.int64) << idx_bits) | jnp.arange(n, dtype=jnp.int64)
    s = jnp.sort(packed)
    return (s & ((1 << idx_bits) - 1)).astype(jnp.int32), s >> idx_bits


def _blocked_cummax(x: jnp.ndarray, chunk: int = 4096) -> jnp.ndarray:
    """Inclusive running max via a two-level blocked scan.

    `jax.lax.associative_scan`'s recursive odd/even tree is a TPU
    *compile-time* bomb at large sizes (measured on the bench chip:
    ~2 min of XLA time at 1.4M elements, >35 min at 5.2M — the k5 shell
    lookup made the whole model uncompilable). Decomposing into a vmapped
    within-row scan + a row-prefix scan + one broadcast max keeps every
    scan tree small (depth <= log2(chunk)), compiling in ~1 s with the
    same O(n) runtime.
    """
    m = x.shape[0]
    if m <= chunk:
        return jax.lax.associative_scan(jnp.maximum, x)
    pad = (-m) % chunk
    ident = jnp.asarray(jnp.iinfo(x.dtype).min, x.dtype)
    xp = jnp.pad(x, (0, pad), constant_values=ident).reshape(-1, chunk)
    within = jax.vmap(lambda r: jax.lax.associative_scan(jnp.maximum, r))(xp)
    row_prefix = jax.lax.associative_scan(jnp.maximum, within[:, -1])
    shifted = jnp.concatenate([ident[None], row_prefix[:-1]])
    return jnp.maximum(within, shifted[:, None]).reshape(-1)[:m]


def _windowed_max(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """Max over the trailing ``window`` positions (inclusive) by doubling
    shifted-max passes — ceil(log2(window)) elementwise passes, no scan.

    `jax.lax.associative_scan` is a TPU *compile-time* bomb at multi-million
    lengths (see `_blocked_cummax`), and even its blocked form leans on the
    same lowering; when the propagation distance is bounded (equal-code runs
    in the neighbor-table sorts are at most #offsets long), a shift cascade
    is compile-trivial and runtime-cheap (each pass is one fused
    pad+max over the array).
    """
    fill = jnp.asarray(jnp.iinfo(x.dtype).min, x.dtype)
    sh = 1
    while sh < window:
        shifted = jnp.concatenate([jnp.full((sh,), fill, x.dtype), x[:-sh]])
        x = jnp.maximum(x, shifted)
        sh *= 2
    return x


def exact_match_lookup(
    keys: jnp.ndarray,
    key_index: jnp.ndarray,
    queries: jnp.ndarray,
    key_bits: int,
    missing: int,
    max_run: Optional[int] = None,
) -> jnp.ndarray:
    """For each query key, the ``key_index`` of an equal element of ``keys``,
    or ``missing`` when absent.

    One single-array co-sort of packed words
    ``key << (idx_bits+1) | is_query << idx_bits | payload`` — keys sort
    immediately before equal queries — followed by a cumulative max that
    propagates the most recent key row (carrying its payload) to every
    query, an in-register equality check, and one scatter. No per-element
    post-sort gathers (XLA lowers those to latency-bound scalar loads).

    ``max_run``: when the caller GUARANTEES that at most ``max_run``
    consecutive sorted elements share one code (keys unique per code and a
    bounded number of equal queries — the neighbor-table invariant: voxels
    are unique per scene after GridSample, and a voxel is queried by at
    most #kernel-offsets origins), the key propagation uses a
    log2(max_run) shifted-max cascade instead of a full cumulative scan;
    exactness is unchanged because a query's matching key is always the
    head of its own equal-code run.

    CONTRACT: the bound is trusted, not checked — a violated invariant
    (duplicate voxels stretching an equal-code run past the bound) yields
    silently-missing matches. A runtime check would need a `lax.cond`
    compiling the full-scan fallback alongside every bounded caller, which
    measurably explodes XLA compile time at neighbor-table sizes (the
    round-4 geometry trace went 3.5 s -> ~9 min with nested fallback
    conds). The invariant is instead enforced at the data boundary:
    `assert_unique_voxels` (host-side, used by the data pipeline under
    ``CDSEG_VALIDATE=1`` and by the test suite) fails loudly on duplicated
    voxels before they can reach a jitted table build.
    """
    nk, nq = keys.shape[0], queries.shape[0]
    idx_bits = max((nk + nq - 1).bit_length(), (missing + 1).bit_length())
    if key_bits + idx_bits + 1 > 63:
        # bit budget exceeded (very deep serialization): classic co-sorted
        # searchsorted + equality verification
        sort_idx = jnp.argsort(keys)
        sorted_keys = keys[sort_idx]
        pos = jnp.clip(
            jnp.searchsorted(sorted_keys, queries, method="sort"), 0, nk - 1
        )
        found = jnp.take(sorted_keys, pos) == queries
        return jnp.where(
            found, jnp.take(key_index[sort_idx], pos), missing
        ).astype(jnp.int32)
    shift = idx_bits + 1
    flag = jnp.int64(1) << idx_bits
    pk = (keys.astype(jnp.int64) << shift) | key_index.astype(jnp.int64)
    pq = (
        (queries.astype(jnp.int64) << shift) | flag | jnp.arange(nq, dtype=jnp.int64)
    )
    s = jnp.sort(jnp.concatenate([pk, pq]))
    is_key = (s & flag) == 0
    # most recent key row at or before each position (keys ascend with s)
    masked = jnp.where(is_key, s, jnp.int64(-1))
    if max_run is not None:
        # +1: the window must span the run head (the key) from the run's
        # last query, i.e. max_run query slots plus the key itself
        last_key = _windowed_max(masked, max_run + 1)
    else:
        last_key = _blocked_cummax(masked)
    match = (last_key >= 0) & ((last_key >> shift) == (s >> shift))
    payload = (s & (flag - 1)).astype(jnp.int32)
    neigh = jnp.where(match, (last_key & (flag - 1)).astype(jnp.int32), missing)
    out = jnp.full((nq,), missing, jnp.int32)
    out = out.at[jnp.where(is_key, nq, payload)].set(neigh, mode="drop")
    return out


# ---------------------------------------------------------------------------
# Submanifold-conv neighbor tables (TPU equivalent of spconv hash maps).
# ---------------------------------------------------------------------------


def kernel_offsets(kernel_size: int) -> jnp.ndarray:
    """All integer offsets of a cubic kernel, e.g. 27 for k=3, 125 for k=5."""
    r = kernel_size // 2
    ax = jnp.arange(-r, r + 1)
    ox, oy, oz = jnp.meshgrid(ax, ax, ax, indexing="ij")
    return jnp.stack([ox.ravel(), oy.ravel(), oz.ravel()], axis=-1)  # (K, 3)


@partial(jax.jit, static_argnames=("depth", "kernel_size", "num_scenes"))
def build_neighbor_table(
    grid_coord: jnp.ndarray,
    batch: jnp.ndarray,
    mask: jnp.ndarray,
    depth: int,
    kernel_size: int = 3,
    num_scenes: int = 1,
) -> jnp.ndarray:
    """For each point, the index of the point at ``grid_coord + offset`` for
    every kernel offset, or ``N`` when the voxel is unoccupied.

    This replaces spconv's GPU hash-table build (`indice_key` reuse,
    reference `point_transformer_v3m1_base.py:355-365,646-655`) with an
    XLA-friendly co-sorted exact-match lookup: keys are z-order codes with
    the batch id in the high bits, queries are the offset voxels' codes.

    Neighborhoods are symmetric (j at i+d <=> i at j-d, and the offset
    enumeration satisfies ``offs[K-1-t] = -offs[t]``), so only the first
    half of the offsets is queried — the other half is one scatter. Sorting
    is the dominant cost of the table build; this halves the sorted volume.

    CONTRACT: voxels must be unique per scene (the GridSample invariant,
    reference `transform.py:830-850`; pooled pyramid levels satisfy it by
    construction — clusters of distinct coarse codes). Both the mirror
    halving and `exact_match_lookup`'s run bound rest on it; duplicated
    voxels would produce silently-missing neighbors. The invariant is
    enforced host-side at the data boundary by `assert_unique_voxels`
    (always in the test suite; in the input pipeline under
    ``CDSEG_VALIDATE=1``) — an in-jit check was measured to explode XLA
    compile time via the `lax.cond` fallback it implies.
    """
    n = grid_coord.shape[0]
    offs = kernel_offsets(kernel_size)  # (K, 3)
    k = offs.shape[0]
    half = k // 2  # offsets [0, half) query; (half, k) mirror; half = center
    key_bits = 3 * depth + max((num_scenes + 1).bit_length(), 1)
    keys = ser.encode(grid_coord, batch, depth=depth, order="z")  # (N,)
    # Padding slots share one sentinel key; push them past every real key so
    # a pad voxel never aliases a real query (fits in key_bits: pads already
    # carry the sentinel batch id in the high bits, just add the max code).
    keys = jnp.where(mask, keys, (jnp.int64(1) << key_bits) - 1)

    offs_h = offs[:half]
    q_coord = grid_coord[:, None, :] + offs_h[None, :, :]  # (N, half, 3)
    in_range = jnp.all((q_coord >= 0) & (q_coord < (1 << depth)), axis=-1)
    q_keys = ser.encode(
        q_coord.reshape(-1, 3),
        jnp.repeat(batch, half),
        depth=depth,
        order="z",
    )
    # run bound: voxels are unique per scene (grid-sample invariant), so a
    # code is shared by at most 1 key + `half` queries
    nbr_h = exact_match_lookup(
        keys, jnp.arange(n, dtype=jnp.int32), q_keys, key_bits, missing=n,
        max_run=half,
    ).reshape(n, half)
    nbr_h = jnp.where(in_range & mask[:, None], nbr_h, n)

    # mirror scatter: nbr_h[i, t] = m  =>  neighbor[m, k-1-t] = i.
    # Row n of the scratch buffer absorbs missing entries (index n).
    arange = jnp.arange(n, dtype=jnp.int32)
    mirror = jnp.full((n + 1, half), n, jnp.int32)
    mirror = mirror.at[nbr_h, jnp.arange(half)].set(
        jnp.broadcast_to(arange[:, None], (n, half))
    )
    mirror = mirror[:n, ::-1]  # columns k-1-t for t descending -> ascending

    center = jnp.where(mask, arange, n)[:, None]
    neighbor = jnp.concatenate([nbr_h, center, mirror], axis=1)
    return neighbor.astype(jnp.int32)


def _k5_static_maps():
    """Static index maps between the 125 k5 offsets and the 27 k3 offsets.

    Returns ``(k3_map, shell_half)``: ``k3_map[j]`` is the k3 index of k5
    offset j when its Chebyshev radius is <=1 (else -1), and ``shell_half``
    lists the first-half (j < 62) k5 offsets on the radius-2 shell — the 49
    offsets that need a fresh lookup (their mirrors come from one scatter).
    """
    import numpy as np

    offs5 = np.array(
        [
            (x, y, z)
            for x in range(-2, 3) for y in range(-2, 3) for z in range(-2, 3)
        ]
    )
    idx3 = {
        (x, y, z): ((x + 1) * 3 + (y + 1)) * 3 + (z + 1)
        for x in (-1, 0, 1) for y in (-1, 0, 1) for z in (-1, 0, 1)
    }
    k3_map = np.array(
        [idx3.get(tuple(o), -1) if np.abs(o).max() <= 1 else -1 for o in offs5],
        np.int32,
    )
    shell_half = np.array(
        [j for j in range(62) if np.abs(offs5[j]).max() == 2], np.int32
    )
    assert len(shell_half) == 49
    return k3_map, shell_half


_K5_MAPS = None


@partial(jax.jit, static_argnames=("depth", "num_scenes"))
def build_k5_shell_table(
    grid_coord: jnp.ndarray,
    batch: jnp.ndarray,
    mask: jnp.ndarray,
    n3: jnp.ndarray,
    depth: int,
    num_scenes: int = 1,
) -> jnp.ndarray:
    """Exact 5x5x5 submanifold neighbor table from the k3 table + a lookup
    over only the radius-2 shell.

    The 27 radius-<=1 columns are already exact in ``n3``; the 98 shell
    offsets halve by mirror symmetry to 49 lookup queries (~49N sorted
    words vs 62N for a from-scratch k5 build). This replaces the former
    2-hop closure (`compose_k5_table`), which missed ~45% of true shell
    neighbors on ScanNet-like surfaces (see tools/fidelity_ablations.py) —
    the reference's spconv stem is exact
    (`point_transformer_v3m1_base.py:646-663`).

    Same unique-voxels-per-scene CONTRACT as `build_neighbor_table` (the
    mirror halving and the run bound rest on it); enforced host-side by
    `assert_unique_voxels`, never in-jit.
    """
    global _K5_MAPS
    if _K5_MAPS is None:
        _K5_MAPS = _k5_static_maps()
    k3_map, shell_half = _K5_MAPS
    n = grid_coord.shape[0]
    offs5 = kernel_offsets(5)
    key_bits = 3 * depth + max((num_scenes + 1).bit_length(), 1)
    keys = ser.encode(grid_coord, batch, depth=depth, order="z")
    keys = jnp.where(mask, keys, (jnp.int64(1) << key_bits) - 1)

    offs_s = offs5[jnp.asarray(shell_half)]  # (49, 3)
    h = offs_s.shape[0]
    q_coord = grid_coord[:, None, :] + offs_s[None, :, :]
    in_range = jnp.all((q_coord >= 0) & (q_coord < (1 << depth)), axis=-1)
    q_keys = ser.encode(
        q_coord.reshape(-1, 3), jnp.repeat(batch, h), depth=depth, order="z"
    )
    nbr_s = exact_match_lookup(
        keys, jnp.arange(n, dtype=jnp.int32), q_keys, key_bits, missing=n,
        max_run=h,
    ).reshape(n, h)
    nbr_s = jnp.where(in_range & mask[:, None], nbr_s, n)

    arange = jnp.arange(n, dtype=jnp.int32)
    out = jnp.full((n + 1, 125), n, jnp.int32)
    # radius-<=1 columns straight from the k3 table (both halves + center)
    k3_cols = [j for j in range(125) if k3_map[j] >= 0]
    out = out.at[:n, jnp.asarray(k3_cols)].set(
        n3[:, jnp.asarray(k3_map[k3_cols])]
    )
    # queried shell half
    out = out.at[:n, jnp.asarray(shell_half)].set(nbr_s)
    # mirror scatter: nbr_s[i, t] = m  =>  out[m, 124 - shell_half[t]] = i
    out = out.at[nbr_s, 124 - jnp.asarray(shell_half)[None, :]].set(
        jnp.broadcast_to(arange[:, None], (n, h))
    )
    return out[:n].astype(jnp.int32)


# ---------------------------------------------------------------------------
# Multigrid parity lookup: exact neighbor tables with no sorting.
#
# A stride-2 pooled level's clusters are exactly the 2x2x2 voxel blocks of its
# parent, so (cluster slot, voxel-parity bits) <-> parent voxel is a bijection
# per scene. And for any kernel offset |d|_inf <= 2, floor((x+d)/2) -
# floor(x/2) is in {-1,0,1} per axis — the target voxel's block is within the
# CHILD's own 3x3x3 neighborhood, which the child's k3 table already indexes.
# So the parent's exact k3 AND k5 tables are pure gathers: child-table row
# lookup + an 8-wide member-table gather, no code sort, no hash probe. (The
# sort-based `exact_match_lookup` at level-0 k5 scale sorts ~50N int64 words —
# 88 ms and a 42 MB-per-buffer HBM spike at 104k points; this is ~2 gathers.)
# The only sorted table build left is the coarsest level's (~N/64 points).
# ---------------------------------------------------------------------------


def _parity_bits(gc: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) voxel coords -> (N,) 3-bit position within its 2x2x2 block."""
    return ((gc[:, 0] & 1) << 2) | ((gc[:, 1] & 1) << 1) | (gc[:, 2] & 1)


def build_cluster_members(
    parent_inverse: jnp.ndarray,
    grid_coord: jnp.ndarray,
    mask: jnp.ndarray,
    m: int,
) -> jnp.ndarray:
    """(M+1, 8) table: ``members[cluster, parity] = parent index`` (or Np).

    Unique per slot because voxels are unique per scene and a stride-2
    cluster holds at most one voxel of each parity. Parents of the overflow
    cluster (slot m-1, always invalid by the pyramid convention) are
    excluded — many blocks can share that slot, so any scatter into it
    would alias arbitrary blocks. This makes the parity lookup blind to
    overflowed points; `build_pyramid` therefore only takes the parity path
    when NO pooled level dropped anything (one top-level `lax.cond` on the
    summed `Level.dropped`).
    """
    n = grid_coord.shape[0]
    row = jnp.where(mask & (parent_inverse < m - 1), parent_inverse, m)
    members = jnp.full((m + 1, 8), n, jnp.int32)
    members = members.at[row, _parity_bits(grid_coord)].set(
        jnp.arange(n, dtype=jnp.int32)
    )
    return members.at[m].set(n)  # re-arm the sentinel row


def _parity_select_tables(kernel_size: int):
    """(8, K) static select indices into the flattened (27*8) member block.

    For a point with parity bits r = x & 1 and kernel offset d, the target
    voxel's coarse block is ``floor((r+d)/2)`` relative to the point's own
    block and its member slot is ``(r+d) & 1`` — both depend ONLY on (r, d),
    never on the full coordinate. So per parity class the whole K-column
    lookup is one static fancy-index.
    """
    import numpy as np

    r = kernel_size // 2
    offs = [
        (x, y, z)
        for x in range(-r, r + 1)
        for y in range(-r, r + 1)
        for z in range(-r, r + 1)
    ]
    sel = np.zeros((8, len(offs)), np.int32)
    for pi in range(8):
        pb = ((pi >> 2) & 1, (pi >> 1) & 1, pi & 1)
        for c, d in enumerate(offs):
            e = [(pb[a] + d[a]) // 2 for a in range(3)]
            sb = [(pb[a] + d[a]) % 2 for a in range(3)]
            cidx = ((e[0] + 1) * 3 + (e[1] + 1)) * 3 + (e[2] + 1)
            slot = (sb[0] << 2) | (sb[1] << 1) | sb[2]
            sel[pi, c] = cidx * 8 + slot
    return sel


_PARITY_SEL = {}


def parity_neighbor_table(
    grid_coord: jnp.ndarray,
    mask: jnp.ndarray,
    depth: int,
    parent_inverse: jnp.ndarray,
    child_nbr: jnp.ndarray,
    kernel_size: int = 3,
) -> jnp.ndarray:
    """Exact submanifold neighbor table (kernel 3 or 5) via the stride-2
    child level's cluster structure — row gathers + static selects, no sort.

    Replaces `build_neighbor_table` / `build_k5_shell_table` whenever a
    stride-2 pooled child exists AND that child dropped no point to its
    overflow slot (the TPU answer to spconv's per-layer GPU hash builds,
    reference `point_transformer_v3m1_base.py:355-365,646-663`). Under
    overflow this lookup is one-sidedly wrong (false "missing": dropped
    parents lose their rows and dropped child blocks hide their parents),
    so `build_pyramid` guards the whole parity chain with ONE top-level
    `lax.cond` on the summed `Level.dropped` and falls back to the sorted
    exact builds. It also assumes unique voxels per scene (the member
    table is a (block, parity) -> parent bijection):
    guaranteed at pooled levels by construction and at level 0 by the
    GridSample contract; duplicated level-0 voxels alias to one
    representative per voxel (coordinate-correct, feature-approximate).

    Cost shape matters on TPU: per-element dynamic gathers lower to
    scalar-granularity HBM loads (measured ~12x slower than row gathers —
    a naive `members[tc, slot]` at (N, 125) ran 232 ms). Instead we gather
    each point's 27 adjacent member rows once (32 B rows), then resolve all
    K columns with an 8-way parity-unrolled STATIC fancy-index + select —
    the (block, slot) pair depends only on the point's voxel parity bits.

    Args:
      grid_coord/mask/depth: the PARENT level's voxels (N points).
      parent_inverse: (N,) parent index -> child cluster slot.
      child_nbr: (M, 27) the child level's own k3 table (slot -> slot, M =
        missing).
    Returns (N, K) int32; N marks a missing neighbor.
    """
    if kernel_size not in (3, 5):
        raise ValueError("parity lookup supports kernel 3 or 5 only")
    if kernel_size not in _PARITY_SEL:
        _PARITY_SEL[kernel_size] = _parity_select_tables(kernel_size)
    sel_tab = _PARITY_SEL[kernel_size]  # (8, K) numpy
    n = grid_coord.shape[0]
    m = child_nbr.shape[0]
    offs = kernel_offsets(kernel_size)  # (K, 3)
    members = build_cluster_members(parent_inverse, grid_coord, mask, m)
    own = jnp.where(mask & (parent_inverse < m - 1), parent_inverse, m)
    nbr_rows = jnp.take(child_nbr, jnp.minimum(own, m - 1), axis=0)
    nbr_rows = jnp.where((own < m)[:, None], nbr_rows, m)  # (N, 27)

    # one row gather of each point's 27 adjacent member rows
    blocks = jnp.take(members, nbr_rows, axis=0).reshape(n, 27 * 8)

    pi = _parity_bits(grid_coord)  # (N,)
    nb = jnp.full((n, offs.shape[0]), n, jnp.int32)
    for g in range(8):
        sel_g = blocks[:, sel_tab[g]]  # static fancy-index (N, K)
        nb = jnp.where((pi == g)[:, None], sel_g, nb)

    t = grid_coord[:, None, :] + offs[None]  # (N, K, 3)
    in_range = jnp.all((t >= 0) & (t < (1 << depth)), axis=-1) & mask[:, None]
    return jnp.where(in_range, nb, n).astype(jnp.int32)


def _k3_from_k5_cols():
    """k5 column index of each k3 offset (k3 enumeration order)."""
    cols = []
    for x in (-1, 0, 1):
        for y in (-1, 0, 1):
            for z in (-1, 0, 1):
                cols.append((x + 2) * 25 + (y + 2) * 5 + (z + 2))
    return tuple(cols)


K3_FROM_K5_COLS = _k3_from_k5_cols()


def _k5_decompositions():
    """For every k5 offset d, all (a, b) k3-offset pairs with a + b = d.

    Static numpy table: (125, R) index pairs into the 27 k3 offsets, padded
    by repeating the first candidate.
    """
    import numpy as np

    offs3 = np.array(
        [(x, y, z) for x in (-1, 0, 1) for y in (-1, 0, 1) for z in (-1, 0, 1)]
    )
    idx3 = {tuple(o): i for i, o in enumerate(offs3)}
    offs5 = [
        (x, y, z)
        for x in range(-2, 3) for y in range(-2, 3) for z in range(-2, 3)
    ]
    cands = []
    for d in offs5:
        pairs = []
        for a in offs3:
            b = tuple(np.array(d) - a)
            if b in idx3:
                pairs.append((idx3[tuple(a)], idx3[b]))
        cands.append(pairs)
    r = max(len(p) for p in cands)
    a_idx = np.zeros((125, r), np.int32)
    b_idx = np.zeros((125, r), np.int32)
    for j, pairs in enumerate(cands):
        for t in range(r):
            a_idx[j, t], b_idx[j, t] = pairs[min(t, len(pairs) - 1)]
    return a_idx, b_idx


_K5_PAIRS = None


def compose_k5_table(n3: jnp.ndarray) -> jnp.ndarray:
    """Build the k5 (125-offset) neighbor table by composing two k3 hops.

    Replaces a 125*N-query code search (a ~13M-element sort at full
    resolution) with one (N, 27) ROW gather + static fancy-indexing: the
    neighbor at offset d = a + b is reached via any occupied intermediate
    voxel at offset a; min over candidate paths (all valid paths agree on
    the target index, the sentinel N dominates). Row gathers are the fast
    form here — a flat per-element gather of the same data is ~12x slower
    (scalar-granularity HBM loads), and scatter-based halving via mirror
    symmetry measured slower still; see tools/profile_ssi.py.

    A k5 neighbor whose *every* intermediate k3 voxel is empty is reported
    missing — i.e. the 2-hop submanifold connectivity closure, which on
    surface point clouds coincides with the exact k5 table except at
    isolated diagonal jumps.
    """
    global _K5_PAIRS
    if _K5_PAIRS is None:
        # keep as host numpy constants — a jnp array created under trace
        # would leak a tracer into the module-level cache
        _K5_PAIRS = _k5_decompositions()
    a_idx, b_idx = _K5_PAIRS
    n = n3.shape[0]
    rows = jnp.take(
        n3, n3, axis=0, mode="fill", fill_value=n
    )  # (N, 27, 27): rows[i, a, b]; missing first hop -> sentinel row
    cand = rows[:, a_idx, b_idx]  # (N, 125, R)
    return jnp.min(cand, axis=-1)


def gather_sorted(x: jnp.ndarray, order: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of ``x`` into serialized order."""
    return jnp.take(x, order, axis=0)


def scatter_unsorted(x_sorted: jnp.ndarray, inverse: jnp.ndarray) -> jnp.ndarray:
    """Undo :func:`gather_sorted` given the inverse permutation."""
    return jnp.take(x_sorted, inverse, axis=0)
