"""Shared test utilities: synthetic scenes and brute-force references."""

import jax.numpy as jnp
import numpy as np

from cdsegnet_tpu.models.structure import make_point_batch


def synthetic_batch(
    rng,
    counts=(150, 90),
    num_points=320,
    depth=6,
    feat_dim=6,
    num_classes=5,
):
    """Random scenes with unique voxels per scene (post grid-sample invariant)."""
    coords, grids, batches, feats, segs = [], [], [], [], []
    for b, n in enumerate(counts):
        # sample unique grid coords
        extent = 1 << depth
        seen = set()
        pts = []
        while len(pts) < n:
            c = tuple(rng.randint(0, extent, size=3))
            if c not in seen:
                seen.add(c)
                pts.append(c)
        g = np.array(pts, dtype=np.int32)
        grids.append(g)
        coords.append(g.astype(np.float32) * 0.02 + rng.rand(n, 3) * 0.01)
        batches.append(np.full((n,), b, np.int32))
        feats.append(rng.randn(n, feat_dim).astype(np.float32))
        segs.append(rng.randint(0, num_classes, size=(n,)).astype(np.int32))
    n_real = sum(counts)
    pad = num_points - n_real
    assert pad >= 0
    coord = np.concatenate(coords + [np.zeros((pad, 3), np.float32)])
    grid = np.concatenate(grids + [np.zeros((pad, 3), np.int32)])
    batch = np.concatenate(batches + [np.zeros((pad,), np.int32)])
    feat = np.concatenate(feats + [np.zeros((pad, feat_dim), np.float32)])
    segment = np.concatenate(segs + [np.full((pad,), -1, np.int32)])
    mask = np.concatenate([np.ones((n_real,), bool), np.zeros((pad,), bool)])
    return make_point_batch(
        coord=jnp.asarray(coord),
        feat=jnp.asarray(feat),
        grid_coord=jnp.asarray(grid),
        batch=jnp.asarray(batch),
        mask=jnp.asarray(mask),
        segment=jnp.asarray(segment),
        depth=depth,
        num_scenes=len(counts),
    )
