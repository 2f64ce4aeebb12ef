"""Exact sparse attention over per-query key lists.

TPU counterpart of the reference's `libs/pointops2` `attention_v2` CUDA
kernels (`src/attention_v2/attention_cuda_kernel_v2.cu`,
`functions/pointops2.py:10-238`): each query attends an explicit, private
key set. The reference stores ragged (index_0, index_1) pair lists; here
the key set is a static-width table ``key_idx (N, S)`` (invalid slots =
``N``), so the computation is one gather + one masked softmax — MXU-shaped,
fully differentiable through jax's autodiff (the reference hand-writes four
backward kernels).

Learned relative-position bias over quantized coordinate deltas (the
`rpe_v2` kernels) composes via the ``rel_bias_fn`` hook.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def exact_sparse_attention(
    q: jnp.ndarray,  # (N, H, D)
    k: jnp.ndarray,  # (N, H, D)
    v: jnp.ndarray,  # (N, H, D)
    key_idx: jnp.ndarray,  # (N, S) int32 key indices; N = missing
    scale: Optional[float] = None,
    rel_bias_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    coords: Optional[jnp.ndarray] = None,  # (N, 3) for rel_bias_fn
    upcast_softmax: bool = True,
) -> jnp.ndarray:
    """Attention where query i attends keys ``key_idx[i]`` only.

    ``rel_bias_fn`` receives the (N, S, 3) relative coordinates
    (query - key) and returns an (N, H, S) bias (the rpe_v2 analogue).
    """
    n, h, d = q.shape
    s = key_idx.shape[1]
    scale = scale if scale is not None else d ** -0.5
    valid = key_idx < n
    kk = jnp.take(k, key_idx.reshape(-1), axis=0, mode="fill", fill_value=0)
    vv = jnp.take(v, key_idx.reshape(-1), axis=0, mode="fill", fill_value=0)
    kk = kk.reshape(n, s, h, d)
    vv = vv.reshape(n, s, h, d)
    logits = jnp.einsum("nhd,nshd->nhs", q * scale, kk)
    if rel_bias_fn is not None:
        assert coords is not None
        kc = jnp.take(
            coords, key_idx.reshape(-1), axis=0, mode="fill", fill_value=0
        ).reshape(n, s, 3)
        logits = logits + rel_bias_fn(coords[:, None, :] - kc)
    if upcast_softmax:
        logits = logits.astype(jnp.float32)
    logits = jnp.where(valid[:, None, :], logits, -jnp.inf)
    attn = jax.nn.softmax(logits, axis=-1)
    attn = jnp.where(valid[:, None, :], attn, 0.0).astype(vv.dtype)
    return jnp.einsum("nhs,nshd->nhd", attn, vv)
