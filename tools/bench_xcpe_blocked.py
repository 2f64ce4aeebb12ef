"""k3 (27-tap) xCPE conv: direct row gather vs parity-blocked block rows.

The L0 xCPE convs are the SSI step's largest remaining cost (~95 ms of
219 across 8 blocks): each is an (N, 27) gather of 64-128 B rows — 2.8M
row fetches at the 104k bucket. The blocked formulation (the k125 stem's
trick, `ops.subm_conv.blocked_subm_conv_apply`, adapted to k3) scatters
features into the (M1+1, 8, C) cluster-member table, gathers the 8
parity-relevant adjacent member rows per point (8C-wide rows — 3.4x
fewer fetches), and resolves all 27 taps with one statically
parity-scattered matmul + one-hot slice. The earlier round-5 "blocked
canon-select" variant lost to its explicit select pass; the
weight-scatter form has none.

Usage: python tools/bench_xcpe_blocked.py [num_points]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import cdsegnet_tpu  # noqa: F401
from __graft_entry__ import _synthetic_point_batch
from cdsegnet_tpu.models import pyramid as pyr
from cdsegnet_tpu.ops.subm_conv import subm_conv_apply

ORDERS = ("z", "z-trans", "hilbert", "hilbert-trans")


def timed(label, fn, *args, iters=10):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    dt = (time.time() - t0) / iters * 1e3
    print(f"{label:56s} {dt:8.2f} ms", flush=True)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 104448
    point = _synthetic_point_batch(n, 1, depth=10, seed=0)
    caps = [pyr.round_up(max(n // d, 1024), 1024) for d in (2, 4, 16, 64)]
    geom = jax.jit(
        lambda p: pyr.build_pyramid(
            p, strides=(2, 2, 2, 2), capacities=caps, orders=ORDERS,
            shuffle_key=None,
        )
    )
    print("compiling geometry...", flush=True)
    levels, _ = jax.block_until_ready(geom(point))
    l0, l1 = levels[0], levels[1]
    nbr27 = l0.point.neighbor_idx  # (N, 27) L0 k3 table
    parent_inverse = l1.parent_inverse
    child_nbr = l1.point.neighbor_idx

    from cdsegnet_tpu.ops.subm_conv import blocked_k3_conv_apply

    rng = np.random.RandomState(0)
    for c in (32, 64):
        feat = jnp.asarray(rng.randn(n, c), jnp.bfloat16)
        w = jnp.asarray(rng.randn(27, c, c) * 0.02, jnp.float32)

        ref = timed(
            f"direct (N,27) gather C={c} (pad64 serve config)",
            lambda f: subm_conv_apply(f, nbr27, w, pad_to=64), feat,
        )
        blk = timed(
            f"blocked (N,8) gather of {8*c}ch rows C={c}",
            lambda f: blocked_k3_conv_apply(
                f, w, grid_coord=point.grid_coord, mask=point.mask,
                parent_inverse=parent_inverse, child_nbr=child_nbr,
            ), feat,
        )
        mask = np.asarray(point.mask)
        d = np.abs(np.asarray(ref, np.float32) - np.asarray(blk, np.float32))
        print(f"  exactness C={c}: max|diff| over valid = {d[mask].max():.2e}")


if __name__ == "__main__":
    main()
