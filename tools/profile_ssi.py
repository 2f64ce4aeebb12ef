"""Section-level timing of the SSI forward: pyramid geometry vs model compute.

Times each geometry stage as its own jit so the perf levers named in
DESIGN.md §9 (neighbor tables, k5 stem composition, serialization sorts) get
individual numbers on real hardware. Run on TPU:

    python tools/profile_ssi.py [num_points]
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
    build_k5_shell_table,
    build_neighbor_table,
    compose_k5_table,
    serialize,
)

ORDERS = ("z", "z-trans", "hilbert", "hilbert-trans")


def _sync(out):
    # block_until_ready can return early through the remote-device relay;
    # force ONE scalar host read covering every leaf (each read costs a
    # ~32 ms relay round trip, so never read per-leaf)
    total = jnp.asarray(0.0, jnp.float32)
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "dtype"):
            total = total + jnp.sum(leaf.astype(jnp.float32))
    float(total)


def timed(label, fn, *args, iters=10):
    out = fn(*args)
    _sync(out)
    # dispatch all iterations (device stream executes them in order), then
    # sync once — amortizes the ~32 ms relay read over the loop
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    dt = (time.time() - t0) / iters * 1e3
    print(f"{label:34s} {dt:8.2f} ms", flush=True)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 104448
    patch = 1024
    point = _synthetic_point_batch(n, 1, depth=10, seed=0)
    caps = [pyr.round_up(max(n // d, patch), patch) for d in (2, 4, 16, 64)]

    null_j = jax.jit(lambda x: x + 1.0)
    timed("null dispatch + host read", null_j, jnp.zeros((8,)))

    serialize_j = jax.jit(lambda p: serialize(p, orders=ORDERS))
    pt = timed("serialize x4 (level0)", serialize_j, point)

    nbr_j = jax.jit(
        lambda p: build_neighbor_table(
            p.grid_coord, p.batch, p.mask, depth=10, kernel_size=3, num_scenes=1
        )
    )
    n3 = timed("k3 neighbor table (level0)", nbr_j, pt)

    k5_j = jax.jit(compose_k5_table)
    timed("k5 stem compose (2-hop, old)", k5_j, n3)

    k5s_j = jax.jit(
        lambda p, t: build_k5_shell_table(
            p.grid_coord, p.batch, p.mask, t, depth=10, num_scenes=1
        )
    )
    timed("k5 shell table (exact, live)", k5s_j, pt, n3)

    pyramid_j = jax.jit(
        lambda p: pyr.build_pyramid(
            p, strides=(2, 2, 2, 2), capacities=caps, orders=ORDERS,
            shuffle_key=None,
        )
    )
    levels_out = timed("full pyramid (5 lvls + stem)", pyramid_j, point)

    # parity-gather k5 stem alone (needs level 1 structure)
    from cdsegnet_tpu.models.structure import parity_neighbor_table

    l1 = levels_out[0][1]
    parity_j = jax.jit(
        lambda p, pinv, nbr1: parity_neighbor_table(
            p.grid_coord, p.mask, 10, pinv, nbr1, kernel_size=5
        )
    )
    timed(
        "k5 stem parity gather (new)", parity_j, point, l1.parent_inverse,
        l1.point.neighbor_idx,
    )

    lvl0_j = jax.jit(lambda p: pyr.build_level0(p, ORDERS, None))
    lvl0 = timed("level0 (serialize + k3)", lvl0_j, point)

    pool_j = jax.jit(
        lambda l: pyr.build_pooled_level(l, 2, caps[0], ORDERS, None)
    )
    timed("pooled level 1 (cap %dk)" % (caps[0] // 1000), pool_j, lvl0)

    # full SSI forward (same protocol as bench.py) for the geometry/model
    # split: model compute = full step − "full pyramid" above
    from __graft_entry__ import _flagship_cfg
    from cdsegnet_tpu.models.builder import build_model
    from cdsegnet_tpu.models.segmentor import CNFSegmentor

    cfg = _flagship_cfg(n, patch, scale=1)
    model = build_model(cfg)
    rngs = dict(
        params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
        shuffle=jax.random.PRNGKey(2), diffusion=jax.random.PRNGKey(3),
    )
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(rngs, point)
    noise = jax.random.normal(jax.random.PRNGKey(7), (n, 6))
    ssi_j = jax.jit(
        lambda v, p, z: model.apply(
            v, p, z, method=CNFSegmentor.inference
        )["seg_logits"]
    )
    timed("full SSI forward", ssi_j, variables, point, noise)


if __name__ == "__main__":
    main()
