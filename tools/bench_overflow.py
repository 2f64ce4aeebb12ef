"""Measure the sorted-fallback geometry path under forced pyramid overflow.

Round-4 verdict #7: when any pooling level drops a point, `build_pyramid`
switches the WHOLE phase-2 table build to the sorted-exact branch
(`models/pyramid.py:380-410`) — correct, but its cost was never measured.
This forces an overflowing batch (uniform-random voxels reduce ~1x per
stride-2 level, so the shipped capacity divisors overflow — the round-3
bench bug, now weaponized as a probe) and times geometry + SSI against the
parity-path numbers from the same chip session.

Usage: python tools/bench_overflow.py [num_points]
Prints one JSON line {parity_geom_ms, sorted_geom_ms, parity_step_ms,
sorted_step_ms, dropped}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _flagship_cfg, _synthetic_point_batch
from cdsegnet_tpu.models.builder import build_model
from cdsegnet_tpu.models.segmentor import CNFSegmentor
from cdsegnet_tpu.models.structure import make_point_batch


def _uniform_overflow_batch(num_points: int, depth: int, seed=0):
    """Uniform-random voxels: stride-2 pooling reduces ~1x per level, so the
    flagship capacities (n0 // (2,4,16,64)) drop points at every level."""
    rng = np.random.RandomState(seed)
    n_real = int(num_points * 0.9)
    side = 1 << min(depth, 10)
    # unique voxels (the GridSample invariant) but spatially uniform
    seen = set()
    grid = np.zeros((num_points, 3), np.int64)
    i = 0
    while i < n_real:
        cand = rng.randint(0, side, size=(n_real, 3))
        for row in cand:
            key = (int(row[0]), int(row[1]), int(row[2]))
            if key not in seen:
                seen.add(key)
                grid[i] = row
                i += 1
                if i == n_real:
                    break
    mask = np.arange(num_points) < n_real
    return make_point_batch(
        coord=jnp.asarray(grid * 0.02),
        feat=jnp.asarray(rng.randn(num_points, 6).astype(np.float32)),
        grid_coord=jnp.asarray(grid),
        batch=jnp.asarray(np.zeros(num_points, np.int32)),
        mask=jnp.asarray(mask),
        segment=jnp.asarray(rng.randint(0, 20, size=(num_points,))),
        depth=depth,
        num_scenes=1,
    )


def time_path(model, variables, point, noise, iters=5):
    geom = jax.jit(model.backbone.precompute_geometry)

    @jax.jit
    def ssi(variables, point, noise, geometry):
        return model.apply(
            variables, point, noise, geometry, method=CNFSegmentor.inference,
        )["seg_logits"]

    g = geom(point)
    jax.block_until_ready(g)
    dropped = [int(np.asarray(lvl.dropped)) for lvl in g[0][1:]]
    _ = float(jnp.sum(ssi(variables, point, noise, g)))
    t0 = time.time()
    for _ in range(iters):
        g = geom(point)
    jax.block_until_ready(g[0][1].dropped)
    geom_ms = (time.time() - t0) / iters * 1e3
    t0 = time.time()
    for _ in range(iters):
        out = ssi(variables, point, noise, geom(point))
    _ = float(jnp.sum(out))
    step_ms = (time.time() - t0) / iters * 1e3
    return geom_ms, step_ms, dropped


def main():
    num_points = int(sys.argv[1]) if len(sys.argv) > 1 else 104448
    cfg = _flagship_cfg(num_points, 1024, scale=1)
    model = build_model(cfg)
    surface = _synthetic_point_batch(num_points, 1, depth=10, seed=0)
    overflow = _uniform_overflow_batch(num_points, depth=10, seed=0)
    rngs = dict(
        params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
        shuffle=jax.random.PRNGKey(2), diffusion=jax.random.PRNGKey(3),
    )
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(
        rngs, surface
    )
    noise = jax.random.normal(jax.random.PRNGKey(7), (num_points, 6))
    pg, ps, pd = time_path(model, variables, surface, noise)
    print(f"[overflow-bench] parity path: geom {pg:.1f} ms, step {ps:.1f} ms,"
          f" dropped {pd}", file=sys.stderr, flush=True)
    og, os_, od = time_path(model, variables, overflow, noise)
    print(f"[overflow-bench] sorted path: geom {og:.1f} ms, step {os_:.1f} ms,"
          f" dropped {od}", file=sys.stderr, flush=True)
    assert sum(od) > 0, "overflow batch did not overflow"
    print(json.dumps(dict(
        parity_geom_ms=round(pg, 1), sorted_geom_ms=round(og, 1),
        parity_step_ms=round(ps, 1), sorted_step_ms=round(os_, 1),
        dropped=od, n_points=num_points,
    )))


if __name__ == "__main__":
    main()
