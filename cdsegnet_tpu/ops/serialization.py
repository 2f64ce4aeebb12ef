"""Space-filling-curve serialization codecs (z-order / Hilbert), TPU-native.

Functional parity with the reference codecs
(`/root/reference/pointcept/models/utils/serialization/{default,z_order,hilbert}.py`)
but implemented as word-level int64 bit arithmetic instead of LUTs
(z_order.py:12-126) or uint8 bit-array loops (hilbert.py:91-303):

- z-order uses the classic Morton magic-number bit spreading, fully
  vectorized — no 256-entry table gathers.
- Hilbert uses Skilling's transpose-form algorithm ("Programming the Hilbert
  curve", AIP 2004) with static `depth`-bound loops of whole-word XOR/AND ops,
  which XLA maps straight onto the VPU.

Code layout matches the reference (`serialization/default.py:8-24`):
``code = batch << (3 * depth) | curve_code`` with the x axis occupying the
most-significant bit of each 3-bit group.

All functions are jit-compatible with static `depth`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

ORDERS = ("z", "z-trans", "hilbert", "hilbert-trans")


def _spread3(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 21 bits of ``v`` so bit i moves to bit 3*i (Morton)."""
    v = v.astype(jnp.int64) & 0x1FFFFF
    v = (v | (v << 32)) & 0x1F00000000FFFF
    v = (v | (v << 16)) & 0x1F0000FF0000FF
    v = (v | (v << 8)) & 0x100F00F00F00F00F
    v = (v | (v << 4)) & 0x10C30C30C30C30C3
    v = (v | (v << 2)) & 0x1249249249249249
    return v


def _compact3(v: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`_spread3`: gather every third bit down to the low bits."""
    v = v.astype(jnp.int64) & 0x1249249249249249
    v = (v | (v >> 2)) & 0x10C30C30C30C30C3
    v = (v | (v >> 4)) & 0x100F00F00F00F00F
    v = (v | (v >> 8)) & 0x1F0000FF0000FF
    v = (v | (v >> 16)) & 0x1F00000000FFFF
    v = (v | (v >> 32)) & 0x1FFFFF
    return v


def z_order_encode(grid_coord: jnp.ndarray, depth: int = 16) -> jnp.ndarray:
    """Morton-encode int grid coords ``(N, 3)`` -> int64 codes ``(N,)``.

    Bit ``i`` of x lands at position ``3*i + 2`` (x most significant within
    each triplet), matching the reference LUT construction
    (`z_order.py:40-50`).
    """
    mask = (1 << depth) - 1
    x = grid_coord[:, 0].astype(jnp.int64) & mask
    y = grid_coord[:, 1].astype(jnp.int64) & mask
    z = grid_coord[:, 2].astype(jnp.int64) & mask
    return (_spread3(x) << 2) | (_spread3(y) << 1) | _spread3(z)


def z_order_decode(code: jnp.ndarray, depth: int = 16) -> jnp.ndarray:
    """Decode int64 Morton codes ``(N,)`` -> grid coords ``(N, 3)``."""
    mask = (1 << depth) - 1
    x = _compact3(code >> 2) & mask
    y = _compact3(code >> 1) & mask
    z = _compact3(code) & mask
    return jnp.stack([x, y, z], axis=-1)


def _hilbert_axes_to_transpose(x, y, z, depth: int):
    """Skilling AxesToTranspose for 3 dims, vectorized over points.

    Static python loop over ``depth`` bit planes; each step is a handful of
    whole-word ops.
    """
    X = [x.astype(jnp.int64), y.astype(jnp.int64), z.astype(jnp.int64)]
    M = jnp.int64(1 << (depth - 1))
    Q = 1 << (depth - 1)
    while Q > 1:
        P = jnp.int64(Q - 1)
        for i in range(3):
            cond = (X[i] & Q) != 0
            # invert low bits of X[0] where bit set; else exchange with X[i]
            t = jnp.where(cond, jnp.int64(0), (X[0] ^ X[i]) & P)
            X0 = jnp.where(cond, X[0] ^ P, X[0] ^ t)
            Xi = X[i] ^ t
            X[0] = X0
            if i != 0:
                X[i] = Xi
        Q >>= 1
    # Gray encode
    X[1] = X[1] ^ X[0]
    X[2] = X[2] ^ X[1]
    t = jnp.zeros_like(X[0])
    Q = 1 << (depth - 1)
    while Q > 1:
        t = jnp.where((X[2] & Q) != 0, t ^ jnp.int64(Q - 1), t)
        Q >>= 1
    X = [xi ^ t for xi in X]
    return X


def _hilbert_transpose_to_axes(X, depth: int):
    """Skilling TransposeToAxes for 3 dims (inverse of the above)."""
    X = [xi.astype(jnp.int64) for xi in X]
    N = jnp.int64(2 << (depth - 1))
    # Gray decode by H ^ (H >> 1)
    t = X[2] >> 1
    X[2] = X[2] ^ X[1]
    X[1] = X[1] ^ X[0]
    X[0] = X[0] ^ t
    # Undo excess work
    Q = 2
    while Q != (2 << (depth - 1)):
        P = jnp.int64(Q - 1)
        for i in (2, 1, 0):
            cond = (X[i] & Q) != 0
            t = jnp.where(cond, jnp.int64(0), (X[0] ^ X[i]) & P)
            X0 = jnp.where(cond, X[0] ^ P, X[0] ^ t)
            Xi = X[i] ^ t
            X[0] = X0
            if i != 0:
                X[i] = Xi
        Q <<= 1
    del N
    return X


def hilbert_encode(grid_coord: jnp.ndarray, depth: int = 16) -> jnp.ndarray:
    """Hilbert-encode int grid coords ``(N, 3)`` -> int64 codes ``(N,)``.

    Numerically identical ordering to the reference's bit-array port of
    numpy-hilbert-curve (`hilbert.py:91-198`); dimension 0 provides the most
    significant bit of each 3-bit output group.
    """
    mask = (1 << depth) - 1
    x = grid_coord[:, 0].astype(jnp.int64) & mask
    y = grid_coord[:, 1].astype(jnp.int64) & mask
    z = grid_coord[:, 2].astype(jnp.int64) & mask
    X = _hilbert_axes_to_transpose(x, y, z, depth)
    # Interleave transpose words: bit j of X[i] -> output bit 3*j + (2 - i).
    return (_spread3(X[0]) << 2) | (_spread3(X[1]) << 1) | _spread3(X[2])


def hilbert_decode(code: jnp.ndarray, depth: int = 16) -> jnp.ndarray:
    """Decode int64 Hilbert codes ``(N,)`` -> grid coords ``(N, 3)``."""
    mask = (1 << depth) - 1
    X = [
        _compact3(code >> 2) & mask,
        _compact3(code >> 1) & mask,
        _compact3(code) & mask,
    ]
    X = _hilbert_transpose_to_axes(X, depth)
    return jnp.stack(X, axis=-1)


@partial(jax.jit, static_argnames=("depth", "order"))
def encode(
    grid_coord: jnp.ndarray,
    batch: jnp.ndarray | None = None,
    depth: int = 16,
    order: str = "z",
) -> jnp.ndarray:
    """Serialize grid coords into int64 codes with the batch index in the high
    bits (reference: `serialization/default.py:8-24`)."""
    assert order in ORDERS, order
    if order in ("z-trans", "hilbert-trans"):
        grid_coord = grid_coord[:, jnp.array([1, 0, 2])]
    if order.startswith("z"):
        code = z_order_encode(grid_coord, depth=depth)
    else:
        code = hilbert_encode(grid_coord, depth=depth)
    if batch is not None:
        code = (batch.astype(jnp.int64) << (depth * 3)) | code
    return code


@partial(jax.jit, static_argnames=("depth", "order"))
def decode(code: jnp.ndarray, depth: int = 16, order: str = "z"):
    """Decode int64 codes back to (grid_coord, batch)."""
    assert order in ("z", "hilbert"), order
    batch = code >> (depth * 3)
    code = code & ((1 << (depth * 3)) - 1)
    if order == "z":
        grid_coord = z_order_decode(code, depth=depth)
    else:
        grid_coord = hilbert_decode(code, depth=depth)
    return grid_coord, batch
