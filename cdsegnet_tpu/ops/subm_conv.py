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

import jax
import jax.numpy as jnp


def subm_conv_apply(
    feat: jnp.ndarray,
    neighbor_idx: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    accum_dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """Apply a submanifold conv.

    Args:
      feat: (N, C_in) features.
      neighbor_idx: (N, K) int32; value N marks missing neighbors.
      weight: (K, C_in, C_out).
      bias: optional (C_out,).

    Returns:
      (N, C_out) in ``feat.dtype``.
    """
    n, c_in = feat.shape
    k = neighbor_idx.shape[1]
    assert weight.shape[0] == k, (weight.shape, k)
    c_out = weight.shape[2]
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
    out = jnp.dot(g, w, preferred_element_type=accum_dtype).astype(feat.dtype)
    if bias is not None:
        out = out + bias.astype(feat.dtype)
    return out
