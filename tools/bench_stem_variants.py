"""Stem (k5 = 125-point) conv formulations on REAL geometry.

The dual stem is ONE (N, 125) gather of 24 B rows — 13M row fetches, the
single most row-hungry op in the SSI step (~49 ms isolated even with the
concat materialized). The blocked variant exploits the stride-2 parity
structure instead: scatter features into an (M1+1, 8*C) cluster-member
table, gather each point's 27 adjacent member rows ONCE (192 B rows —
4.6x fewer, 8x wider), resolve all 125 taps with ONE statically
scattered (216C, 8*C_out) matmul, then select the point's parity slice.
Exact under the same no-overflow precondition as the parity tables
(verified in-tool against the direct gather).

Usage: python tools/bench_stem_variants.py [num_points]
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
from cdsegnet_tpu.ops.subm_conv import dual_subm_conv_apply

ORDERS = ("z", "z-trans", "hilbert", "hilbert-trans")


def timed(label, fn, *args, iters=10):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = f(*args)
    _ = sum(
        float(jnp.sum(o.astype(jnp.float32)))
        for o in (out if isinstance(out, tuple) else (out,))
    )
    dt = (time.time() - t0) / iters * 1e3
    print(f"{label:52s} {dt:8.2f} ms", flush=True)
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
    levels, stem_nbr = jax.block_until_ready(geom(point))
    print("geometry done", flush=True)
    l1 = levels[1]
    m1 = l1.size
    parent_inverse = l1.parent_inverse  # (N,) L0 point -> L1 cluster slot
    child_nbr = l1.point.neighbor_idx  # (M1, 27) L1 k3 table

    rng = np.random.RandomState(0)
    cin, cout = 6, 32
    nf = jnp.asarray(rng.randn(n, cin), jnp.bfloat16)
    cf = jnp.asarray(rng.randn(n, cin), jnp.bfloat16)
    wn = jnp.asarray(rng.randn(125, cin, cout) * 0.05, jnp.float32)
    wc = jnp.asarray(rng.randn(125, cin, cout) * 0.05, jnp.float32)

    ref = timed(
        "dual stem (N,125) gather of 24B rows",
        lambda a, b, i: dual_subm_conv_apply(a, b, i, wn, wc),
        nf, cf, stem_nbr,
    )

    from cdsegnet_tpu.ops.subm_conv import blocked_stem_apply

    blk = timed(
        "blocked stem (N,27) gather of 192B rows + 1 matmul",
        lambda a, b: blocked_stem_apply(
            a, b, wn, wc,
            grid_coord=point.grid_coord, mask=point.mask,
            parent_inverse=parent_inverse, child_nbr=child_nbr,
        ),
        nf, cf,
    )

    mask = np.asarray(point.mask)
    for name, r, o in (("n", ref[0], blk[0]), ("c", ref[1], blk[1])):
        d = np.abs(np.asarray(r, np.float32) - np.asarray(o, np.float32))
        print(f"  exactness [{name}]: max|diff| over valid = "
              f"{d[mask].max():.2e}")


if __name__ == "__main__":
    main()
