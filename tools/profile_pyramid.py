"""Fine-grained on-chip timing of build_pyramid internals.

Sections: serialize, each pooled level WITHOUT its neighbor table (matching
what build_pyramid actually pays in phase 1), the coarsest sorted k3 seed,
each parity-gather table in phase 2, and the full pyramid. Run on TPU:

    python tools/profile_pyramid.py [num_points]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import cdsegnet_tpu  # noqa: F401
from __graft_entry__ import _synthetic_point_batch
from cdsegnet_tpu.models import pyramid as pyr
from cdsegnet_tpu.models.structure import (
    build_neighbor_table,
    parity_neighbor_table,
    serialize,
)

ORDERS = ("z", "z-trans", "hilbert", "hilbert-trans")


def _sync(out):
    total = jnp.asarray(0.0, jnp.float32)
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "dtype"):
            total = total + jnp.sum(leaf.astype(jnp.float32))
    float(total)


def timed(label, fn, *args, iters=10):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.time() - t0) / iters * 1e3
    print(f"{label:40s} {dt:8.2f} ms", flush=True)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 104448
    patch = 1024
    point = _synthetic_point_batch(n, 1, depth=10, seed=0)
    caps = [pyr.round_up(max(n // d, patch), patch) for d in (2, 4, 16, 64)]

    null_j = jax.jit(lambda x: x + 1.0)
    timed("null dispatch + host read", null_j, jnp.zeros((8,)))

    lvl0_nn_j = jax.jit(
        lambda p: pyr.build_level0(p, ORDERS, None, build_nbr=False)
    )
    lvl0 = timed("level0 serialize (no nbr)", lvl0_nn_j, point)

    # phase-1 chain: pooled levels, no neighbor tables (what the pyramid pays)
    levels = [lvl0]
    for i, cap in enumerate(caps):
        pool_j = jax.jit(
            lambda l, c=cap: pyr.build_pooled_level(
                l, 2, c, ORDERS, None, build_nbr=False
            )
        )
        lvl = timed(
            f"pool level {i + 1} (cap {cap // 1000}k, no nbr)", pool_j,
            levels[-1],
        )
        levels.append(lvl)

    # coarsest sorted k3 seed
    last = levels[-1].point
    seed_j = jax.jit(
        lambda p: build_neighbor_table(
            p.grid_coord, p.batch, p.mask, depth=p.depth, kernel_size=3,
            num_scenes=p.num_scenes,
        )
    )
    seed = timed(f"coarsest k3 seed ({last.num_points})", seed_j, last)

    # parity chain, coarse -> fine
    child_tbl = seed
    for lv in range(len(caps) - 1, -1, -1):
        pt = levels[lv].point
        child = levels[lv + 1]
        k = 5 if lv == 0 else 3
        par_j = jax.jit(
            lambda g, m, pinv, t, k=k, d=pt.depth: parity_neighbor_table(
                g, m, d, pinv, t, kernel_size=k
            )
        )
        child_tbl = timed(
            f"parity k{k} level {lv} ({pt.num_points // 1000}k)", par_j,
            pt.grid_coord, pt.mask, child.parent_inverse, child_tbl,
        )
        if k == 5:
            from cdsegnet_tpu.models.structure import K3_FROM_K5_COLS

            child_tbl = child_tbl[:, jnp.asarray(K3_FROM_K5_COLS)]

    for exact in ("parity", "cond"):
        pyramid_j = jax.jit(
            lambda p, e=exact: pyr.build_pyramid(
                p, strides=(2, 2, 2, 2), capacities=caps, orders=ORDERS,
                shuffle_key=None, exactness=e,
            )
        )
        timed(f"full pyramid [{exact}]", pyramid_j, point)


if __name__ == "__main__":
    main()
