"""Serialization codec tests.

Golden vectors in `golden_serialization.json` were produced by executing the
reference codecs (`pointcept/models/utils/serialization/{z_order,hilbert}.py`)
once on CPU; they pin exact bit-level parity of our word-level implementation.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from cdsegnet_tpu.ops import serialization as ser

GOLDEN = json.load(
    open(os.path.join(os.path.dirname(__file__), "golden_serialization.json"))
)


@pytest.mark.parametrize("order", ["z", "z-trans", "hilbert", "hilbert-trans"])
def test_golden_parity(order):
    gc = jnp.asarray(np.array(GOLDEN["grid_coord"], dtype=np.int64))
    b = jnp.asarray(np.array(GOLDEN["batch"], dtype=np.int64))
    code = ser.encode(gc, b, depth=10, order=order)
    np.testing.assert_array_equal(
        np.asarray(code), np.array(GOLDEN[order], dtype=np.int64)
    )


@pytest.mark.parametrize("order", ["z", "hilbert"])
@pytest.mark.parametrize("depth", [4, 10, 16])
def test_roundtrip(order, depth, rng):
    gc = jnp.asarray(rng.randint(0, 1 << depth, size=(200, 3)).astype(np.int64))
    code = ser.encode(gc, None, depth=depth, order=order)
    dec, _ = ser.decode(code, depth=depth, order=order)
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(gc))


def test_batch_in_high_bits(rng):
    gc = jnp.asarray(rng.randint(0, 1 << 8, size=(64, 3)).astype(np.int64))
    b = jnp.asarray(rng.randint(0, 4, size=(64,)).astype(np.int64))
    code = ser.encode(gc, b, depth=8, order="z")
    _, b_dec = ser.decode(code, depth=8, order="z")
    np.testing.assert_array_equal(np.asarray(b_dec), np.asarray(b))
    # codes sort grouped by batch
    srt = np.asarray(code)
    order = np.argsort(srt, kind="stable")
    np.testing.assert_array_equal(np.sort(np.asarray(b)), np.asarray(b)[order])


def test_hilbert_locality():
    # consecutive codes along the curve correspond to adjacent voxels
    n = 1 << 4
    xs, ys, zs = np.meshgrid(np.arange(n), np.arange(n), np.arange(n), indexing="ij")
    gc = jnp.asarray(
        np.stack([xs.ravel(), ys.ravel(), zs.ravel()], axis=-1).astype(np.int64)
    )
    code = np.asarray(ser.encode(gc, None, depth=4, order="hilbert"))
    order = np.argsort(code)
    path = np.asarray(gc)[order]
    step = np.abs(np.diff(path, axis=0)).sum(axis=1)
    assert (step == 1).all()  # a true Hilbert curve moves one voxel at a time
