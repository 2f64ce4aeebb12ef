"""Submanifold sparse convolution as gather + MXU matmul.

TPU-native replacement for `spconv.SubMConv3d` (the reference's xCPE layers
and embedding stem, `point_transformer_v3m1_base.py:355-365,646-655`).
Outputs exist only at input sites (submanifold semantics). The neighbor table
comes from :func:`cdsegnet_tpu.models.structure.build_neighbor_table` and is
shared by all blocks at the same resolution level (the analogue of spconv's
``indice_key`` reuse).

The weight layout is ``(K, C_in, C_out)`` where K enumerates kernel offsets
in the same order as `kernel_offsets`; missing neighbors contribute zero
(implemented by a zero guard row appended to the features).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _gather_matmul(feat, neighbor_idx, weight, accum_dtype, pad_to=0):
    """Neighbor gather + one MXU contraction.

    See `_gather_matmul_remat` for the memory rationale; this raw form is
    used when an outer `nn.remat` already rematerializes the enclosing
    block (nesting a second checkpoint inside it recomputes the gather
    twice per backward and blocks CSE — measured 20% train-throughput loss
    at the 204.8k recipe bucket).

    ``pad_to``: zero-pad narrow channel rows to this width before the
    gather. Data-dependent gathers on TPU are row-LATENCY bound, not
    byte bound, for rows under ~128 B (DESIGN §13): a (N*27, 32)-bf16
    gather reads 64 B rows at the same per-row cost as 128 B rows, so
    padding C=32 features to 64 channels makes the same pass move twice
    the useful... zero bytes — but lets XLA issue wider row fetches that
    better amortize per-row overhead (measured 19.9 -> 16.3 ms for the
    L0 C=32 xCPE, `tools/bench_xcpe_variants.py`). Exact: padded weight
    rows are zero, f32 accumulation of zeros is exact."""
    n, c_in = feat.shape
    k = neighbor_idx.shape[1]
    c_out = weight.shape[2]
    if 0 < c_in < pad_to:
        feat = jnp.pad(feat, ((0, 0), (0, pad_to - c_in)))
        weight = jnp.pad(weight, ((0, 0), (0, pad_to - c_in), (0, 0)))
        c_in = pad_to
    # One gather of all K offsets + one MXU matmul. A loop over offsets would
    # serialize K small gathers (each HBM-latency-bound); the fused form lets
    # XLA pipeline the gather and runs a single (N, K*C_in) @ (K*C_in, C_out)
    # contraction at full MXU utilization. Missing neighbors carry index N,
    # which the OOB-fill gather turns into zero rows (no guard-row concat or
    # select pass).
    g = jnp.take(
        feat, neighbor_idx.reshape(-1), axis=0, mode="fill", fill_value=0
    )  # (N*K, C_in)
    g = g.reshape(n, k * c_in)
    w = weight.reshape(k * c_in, c_out).astype(feat.dtype)
    return jnp.dot(g, w, preferred_element_type=accum_dtype).astype(feat.dtype)


#: `jax.checkpoint` wrapper: the gathered ``(N, K*C_in)`` operand is a
#: residual of the weight grad (``dW = g^T @ dout``); without remat it is
#: stored bf16 across fwd+bwd — 54*N*C bytes per conv, ~1.6 GB across the
#: flagship's 34 xCPE convs + k5 stem at the 104k train bucket (measured
#: via XLA memory_analysis), part of what pushed the round-3 no-remat train
#: step out of v5e HBM. The checkpoint re-runs the (cheap, bandwidth-
#: comparable-to-the-saved-read) gather in backward instead; the unused
#: forward matmul recompute is dead-code-eliminated by XLA.
_gather_matmul_remat = functools.partial(
    jax.checkpoint, static_argnums=(3, 4)
)(_gather_matmul)


def subm_conv_apply(
    feat: jnp.ndarray,
    neighbor_idx: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    accum_dtype: jnp.dtype = jnp.float32,
    remat_gather: bool = True,
    pad_to: int = 0,
) -> jnp.ndarray:
    """Apply a submanifold conv.

    Args:
      feat: (N, C_in) features.
      neighbor_idx: (N, K) int32; value N marks missing neighbors.
      weight: (K, C_in, C_out).
      bias: optional (C_out,).
      remat_gather: recompute the (N, K*C_in) gather in backward instead of
        storing it (see `_gather_matmul_remat`). Pass False when an outer
        `nn.remat` already covers the call site.
      pad_to: zero-pad C_in below this width before the gather (exact;
        see `_gather_matmul`). 0 disables.

    Returns:
      (N, C_out) in ``feat.dtype``.
    """
    assert weight.shape[0] == neighbor_idx.shape[1], (
        weight.shape, neighbor_idx.shape)
    fn = _gather_matmul_remat if remat_gather else _gather_matmul
    out = fn(feat, neighbor_idx, weight, accum_dtype, pad_to)
    if bias is not None:
        out = out + bias.astype(feat.dtype)
    return out


def _dual_gather_matmul(feat_cat, neighbor_idx, weight_a, weight_b,
                        accum_dtype):
    """ONE neighbor gather of concatenated branch channels, then one MXU
    contraction per branch on its channel slice.

    Unlike the block-diagonal trick (`dual_subm_conv_apply`) this adds no
    FLOPs: the per-branch matmul contracts only that branch's slice
    (27*(Ca^2 + Cb^2) vs the block-diagonal 27*(Ca+Cb)^2 — 1.5x more at the
    512/128 bottleneck widths). The gather fetches rows of width Ca+Cb —
    2x the bytes per row of a single-branch gather, which is the round-4
    roofline's prescription: the SSI step is gather-efficiency bound on
    64-128 B rows (DESIGN §13), so fewer, wider gathers run closer to HBM
    speed. Reference hot path: two separate spconv calls per branch pair
    (`point_transformer_v3m1_base.py:355-365`)."""
    n = feat_cat.shape[0]
    k = neighbor_idx.shape[1]
    ca = weight_a.shape[1]
    g = jnp.take(
        feat_cat, neighbor_idx.reshape(-1), axis=0, mode="fill", fill_value=0
    ).reshape(n, k, feat_cat.shape[1])
    ga = g[:, :, :ca].reshape(n, k * ca)
    gb = g[:, :, ca:].reshape(n, k * (feat_cat.shape[1] - ca))
    wa = weight_a.reshape(k * ca, weight_a.shape[2]).astype(feat_cat.dtype)
    wb = weight_b.reshape(gb.shape[1], weight_b.shape[2]).astype(feat_cat.dtype)
    out_a = jnp.dot(ga, wa, preferred_element_type=accum_dtype)
    out_b = jnp.dot(gb, wb, preferred_element_type=accum_dtype)
    return out_a.astype(feat_cat.dtype), out_b.astype(feat_cat.dtype)


#: checkpoint: recompute the (N, K, Ca+Cb) gather in backward instead of
#: storing it (same rationale as `_gather_matmul_remat`)
_dual_gather_matmul_remat = functools.partial(
    jax.checkpoint, static_argnums=(4,)
)(_dual_gather_matmul)


def dual_subm_conv_sliced(
    feat_a: jnp.ndarray,
    feat_b: jnp.ndarray,
    neighbor_idx: jnp.ndarray,
    weight_a: jnp.ndarray,
    weight_b: jnp.ndarray,
    bias_a: jnp.ndarray | None = None,
    bias_b: jnp.ndarray | None = None,
    accum_dtype: jnp.dtype = jnp.float32,
    remat_gather: bool = True,
):
    """Two submanifold convs over the SAME neighbor table with ONE gather
    (slice-matmul form; see `_dual_gather_matmul`). Used by the fused
    dual-branch xCPE path of `models.ptv3.DualBlock`."""
    cat = jnp.concatenate([feat_a, feat_b.astype(feat_a.dtype)], axis=-1)
    # materialize: XLA otherwise fuses the concat INTO the gather, turning
    # every fetched row into TWO half-width fetches — measured 61 -> 49 ms
    # on the isolated k125 stem (row latency, not bytes, is the cost)
    cat = jax.lax.optimization_barrier(cat)
    fn = _dual_gather_matmul_remat if remat_gather else _dual_gather_matmul
    out_a, out_b = fn(cat, neighbor_idx, weight_a, weight_b, accum_dtype)
    if bias_a is not None:
        out_a = out_a + bias_a.astype(out_a.dtype)
    if bias_b is not None:
        out_b = out_b + bias_b.astype(out_b.dtype)
    return out_a, out_b


def dual_subm_conv_apply(
    feat_a: jnp.ndarray,
    feat_b: jnp.ndarray,
    neighbor_idx: jnp.ndarray,
    weight_a: jnp.ndarray,
    weight_b: jnp.ndarray,
    accum_dtype: jnp.dtype = jnp.float32,
):
    """Two submanifold convs over the SAME neighbor table with one gather.

    Used by the dual-branch stem: the n/c embeddings share the k5 table, so
    their feature gathers are fused by concatenating channels and applying a
    block-diagonal weight (offset-block `[Wa 0; 0 Wb]`). Halves the stem's
    HBM gather passes.
    """
    ca = feat_a.shape[1]
    k = neighbor_idx.shape[1]
    cb, coa, cob = feat_b.shape[1], weight_a.shape[2], weight_b.shape[2]
    cat = jnp.concatenate([feat_a, feat_b.astype(feat_a.dtype)], axis=-1)
    # materialize before the gather (see dual_subm_conv_sliced): un-barriered,
    # the concat fuses into the gather and doubles the per-row fetch count
    cat = jax.lax.optimization_barrier(cat)
    wa = weight_a.astype(feat_a.dtype)
    wb = weight_b.astype(feat_a.dtype)
    w = jnp.concatenate(
        [
            jnp.concatenate(
                [wa, jnp.zeros((k, ca, cob), feat_a.dtype)], axis=2
            ),
            jnp.concatenate(
                [jnp.zeros((k, cb, coa), feat_a.dtype), wb], axis=2
            ),
        ],
        axis=1,
    )
    # the stem sits outside any block-level nn.remat — always checkpoint
    out = _gather_matmul_remat(cat, neighbor_idx, w, accum_dtype, 0)
    return out[:, :coa], out[:, coa:]


def _blocked_stem(cat, pb, row, nbr_rows, w_all, m, accum_dtype):
    """Gather + matmul core of the blocked conv forms (checkpointable).

    ``nbr_rows`` is (N, R) with R=27 for the k125 stem (all adjacent
    clusters) or R=8 for k3 xCPE (the parity-relevant octant)."""
    n, c = cat.shape
    r = nbr_rows.shape[1]
    co8 = w_all.shape[1]
    members = (
        jnp.zeros((m + 1, 8, c), cat.dtype)
        .at[row, pb].set(jnp.where(row[:, None] < m, cat, 0))
        .at[m].set(0)  # re-arm the empty sentinel row
    )
    blocks = jnp.take(
        members.reshape(m + 1, 8 * c), nbr_rows.reshape(-1), axis=0
    ).reshape(n, r * 8 * c)
    out_all = jnp.dot(blocks, w_all, preferred_element_type=accum_dtype)
    onehot = jax.nn.one_hot(pb, 8, dtype=out_all.dtype)
    return jnp.einsum(
        "npc,np->nc", out_all.reshape(n, 8, co8 // 8), onehot
    ).astype(cat.dtype)


_blocked_stem_remat = functools.partial(jax.checkpoint, static_argnums=(5, 6))(
    _blocked_stem
)


def blocked_subm_conv_apply(
    feat: jnp.ndarray,
    weight: jnp.ndarray,
    *,
    grid_coord: jnp.ndarray,
    mask: jnp.ndarray,
    parent_inverse: jnp.ndarray,
    child_nbr: jnp.ndarray,
    accum_dtype: jnp.dtype = jnp.float32,
    remat_gather: bool = True,
) -> jnp.ndarray:
    """k5 (125-tap) submanifold conv via the stride-2 parity structure:
    27 block-row gathers per point instead of 125 row gathers.

    The (N, 125) stem gather fetches C-channel rows — 13M row fetches at
    the 104k bucket, pure row latency (DESIGN §13). This formulation
    scatters features into an (M1+1, 8, C) cluster-member table (each
    stride-2 cluster holds at most one voxel per parity), gathers each
    point's 27 ADJACENT MEMBER ROWS once via the level-1 k3 table (8C-wide
    rows, 4.6x fewer fetches), and resolves all 125 taps with ONE matmul
    against a statically parity-scattered (216C, 8*C_out) weight — the
    (cluster, parity) slot of each kernel offset depends only on the
    point's own parity bits (`structure._parity_select_tables`), so the
    select collapses into the weight layout plus a final 8-way one-hot
    slice. Measured 61 -> 17 ms on the isolated dual k5 stem
    (`tools/bench_stem_variants.py`).

    EXACT (to f32-accumulation reordering) under the same preconditions as
    the parity neighbor tables: no pooled-level overflow and unique voxels
    per scene (reference spconv stem is exact,
    `point_transformer_v3m1_base.py:646-663`). Callers must route
    overflowed batches to the sorted `stem_nbr` gather fallback, exactly
    like `build_pyramid`'s table cond (`models.ptv3` stems do this with
    one `lax.cond` on the summed `Level.dropped`).

    Args:
      feat: (N, C) features.
      weight: (125, C, C_out), `kernel_offsets(5)` enumeration order.
      grid_coord/mask: level-0 voxels.
      parent_inverse: (N,) level-0 point -> level-1 cluster slot.
      child_nbr: (M1, 27) the level-1 k3 table (missing = M1).
    Returns: (N, C_out) in ``feat.dtype``.
    """
    import numpy as np

    from cdsegnet_tpu.models.structure import (
        _PARITY_SEL,
        _parity_bits,
        _parity_select_tables,
    )

    if 5 not in _PARITY_SEL:
        _PARITY_SEL[5] = _parity_select_tables(5)
    sel = _PARITY_SEL[5]  # (8, 125) numpy
    c, co = feat.shape[1], weight.shape[2]
    m = child_nbr.shape[0]

    pb = _parity_bits(grid_coord)
    # overflow-cluster parents (slot m-1) and padding go to the trash row
    row = jnp.where(mask & (parent_inverse < m - 1), parent_inverse, m)
    nbr_rows = jnp.take(child_nbr, jnp.minimum(row, m - 1), axis=0)
    nbr_rows = jnp.where((row < m)[:, None], nbr_rows, m)  # (N, 27)

    # parity-scatter the weight to the (216, C) block layout: slot
    # sel[g, k] of parity class g holds kernel tap k
    g_idx = np.repeat(np.arange(8), 125)
    k_idx = np.tile(np.arange(125), 8)
    w_all = (
        jnp.zeros((216, c, 8, co), feat.dtype)
        .at[sel.reshape(-1), :, g_idx, :].set(weight.astype(feat.dtype)[k_idx])
        .reshape(216 * c, 8 * co)
    )

    fn = _blocked_stem_remat if remat_gather else _blocked_stem
    return fn(feat, pb, row, nbr_rows, w_all, m, accum_dtype)


def blocked_stem_apply(
    feat_a: jnp.ndarray,
    feat_b: jnp.ndarray,
    weight_a: jnp.ndarray,
    weight_b: jnp.ndarray,
    *,
    grid_coord: jnp.ndarray,
    mask: jnp.ndarray,
    parent_inverse: jnp.ndarray,
    child_nbr: jnp.ndarray,
    accum_dtype: jnp.dtype = jnp.float32,
    remat_gather: bool = True,
):
    """Dual-branch k5 stem via `blocked_subm_conv_apply`: concatenated
    branch channels, block-diagonal weight, one shared block gather."""
    ca, cb = feat_a.shape[1], feat_b.shape[1]
    coa, cob = weight_a.shape[2], weight_b.shape[2]
    cat = jnp.concatenate([feat_a, feat_b.astype(feat_a.dtype)], axis=-1)
    cat = jax.lax.optimization_barrier(cat)
    wa = weight_a.astype(cat.dtype)
    wb = weight_b.astype(cat.dtype)
    w = jnp.concatenate(
        [
            jnp.concatenate([wa, jnp.zeros((125, ca, cob), cat.dtype)], 2),
            jnp.concatenate([jnp.zeros((125, cb, coa), cat.dtype), wb], 2),
        ],
        axis=1,
    )  # (125, Ca+Cb, Coa+Cob)
    out = blocked_subm_conv_apply(
        cat, w, grid_coord=grid_coord, mask=mask,
        parent_inverse=parent_inverse, child_nbr=child_nbr,
        accum_dtype=accum_dtype, remat_gather=remat_gather,
    )
    return out[:, :coa], out[:, coa:]


_K3_BLOCK_TABLES = None


def _blocked_k3_tables():
    """Static tables for the k3 blocked form.

    ``cols8[g]``: which 8 of the child k3 row's 27 columns are the
    parity-relevant octant for parity class g (per axis, offsets
    {pb-1, pb} — a point's 27 taps live entirely inside those clusters).
    ``sel[g, k]``: flat (local_cluster * 8 + parity) slot of tap k for
    parity class g — injective per g since d = 2e + r - pb."""
    import numpy as np

    offs = [
        (x, y, z) for x in (-1, 0, 1) for y in (-1, 0, 1) for z in (-1, 0, 1)
    ]
    cols8 = np.zeros((8, 8), np.int32)
    sel = np.zeros((8, 27), np.int32)
    for g in range(8):
        pb = ((g >> 2) & 1, (g >> 1) & 1, g & 1)
        for loc in range(8):
            b = ((loc >> 2) & 1, (loc >> 1) & 1, loc & 1)
            e = [pb[a] - 1 + b[a] for a in range(3)]
            cols8[g, loc] = ((e[0] + 1) * 3 + (e[1] + 1)) * 3 + (e[2] + 1)
        for k, d in enumerate(offs):
            e = [(pb[a] + d[a]) // 2 for a in range(3)]
            r = [(pb[a] + d[a]) % 2 for a in range(3)]
            b = [e[a] - (pb[a] - 1) for a in range(3)]
            assert all(0 <= x <= 1 for x in b)
            loc = (b[0] << 2) | (b[1] << 1) | b[2]
            rr = (r[0] << 2) | (r[1] << 1) | r[2]
            sel[g, k] = loc * 8 + rr
        assert len(set(sel[g])) == 27  # injective per parity class
    return cols8, sel


def blocked_k3_conv_apply(
    feat: jnp.ndarray,
    weight: jnp.ndarray,
    *,
    grid_coord: jnp.ndarray,
    mask: jnp.ndarray,
    parent_inverse: jnp.ndarray,
    child_nbr: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    accum_dtype: jnp.dtype = jnp.float32,
    remat_gather: bool = True,
) -> jnp.ndarray:
    """k3 (27-tap) submanifold conv via the stride-2 parity structure:
    8 block-row gathers per point instead of 27 row gathers.

    The k3 analogue of `blocked_subm_conv_apply` (k125 stem): a point's
    27 taps live entirely in the 8 parity-relevant adjacent clusters
    (per axis {pb-1, pb}), so the gather fetches 8 rows of 8C channels
    (3.4x fewer, 8x wider rows) and ONE statically parity-scattered
    (64C, 8*C_out) matmul + one-hot slice resolves every tap. Same
    exactness preconditions as the parity tables (no pooled-level
    overflow, unique voxels) — callers cond on `Level.dropped` exactly
    like the stem. Reference: spconv xCPE
    (`point_transformer_v3m1_base.py:355-365`).

    Args:
      feat: (N, C); weight: (27, C, C_out) in `kernel_offsets(3)` order.
      grid_coord/mask: THIS level's voxels (level L).
      parent_inverse: (N,) level-L point -> level-(L+1) cluster slot.
      child_nbr: (M, 27) the level-(L+1) k3 table (missing = M).
    Returns: (N, C_out) in ``feat.dtype``.
    """
    import numpy as np

    from cdsegnet_tpu.models.structure import _parity_bits

    global _K3_BLOCK_TABLES
    if _K3_BLOCK_TABLES is None:
        _K3_BLOCK_TABLES = _blocked_k3_tables()
    cols8, sel = _K3_BLOCK_TABLES
    c, co = feat.shape[1], weight.shape[2]
    m = child_nbr.shape[0]

    pb = _parity_bits(grid_coord)
    row = jnp.where(mask & (parent_inverse < m - 1), parent_inverse, m)
    nbr27 = jnp.take(child_nbr, jnp.minimum(row, m - 1), axis=0)
    nbr27 = jnp.where((row < m)[:, None], nbr27, m)  # (N, 27)
    # 8-way parity select of the relevant octant columns
    nbr8 = jnp.full((feat.shape[0], 8), m, jnp.int32)
    for g in range(8):
        nbr8 = jnp.where((pb == g)[:, None], nbr27[:, cols8[g]], nbr8)

    g_idx = np.repeat(np.arange(8), 27)
    k_idx = np.tile(np.arange(27), 8)
    w_all = (
        jnp.zeros((64, c, 8, co), feat.dtype)
        .at[sel.reshape(-1), :, g_idx, :].set(weight.astype(feat.dtype)[k_idx])
        .reshape(64 * c, 8 * co)
    )

    fn = _blocked_stem_remat if remat_gather else _blocked_stem
    out = fn(feat, pb, row, nbr8, w_all, m, accum_dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
