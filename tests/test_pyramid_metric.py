"""Metric grid pooling (reference PTv2 GridPool,
`point_transformer_v2m2_base.py:229-269`): voxel clustering at continuous
grid sizes on the static-bucket pyramid."""

import jax.numpy as jnp
import numpy as np

from cdsegnet_tpu.models import pyramid as pyr
from cdsegnet_tpu.models.structure import make_point_batch


def _batch(coords, scene_ids, num_points):
    n = len(coords)
    coord = np.zeros((num_points, 3), np.float32)
    coord[:n] = coords
    batch = np.full((num_points,), 2, np.int32)
    batch[:n] = scene_ids
    mask = np.arange(num_points) < n
    return make_point_batch(
        coord=jnp.asarray(coord),
        feat=jnp.asarray(np.zeros((num_points, 4), np.float32)),
        grid_coord=jnp.asarray((coord / 0.02).astype(np.int32)),
        batch=jnp.asarray(batch),
        mask=jnp.asarray(mask),
        segment=None,
        depth=10,
        num_scenes=2,
    )


def test_metric_level_clusters_and_means():
    # scene 0: two points in the same 0.1-voxel, one in another; scene 1:
    # one point in the *same* voxel coordinates as scene 0 (must NOT merge)
    coords = np.array(
        [
            [0.01, 0.01, 0.01],
            [0.05, 0.05, 0.05],   # same 0.1 voxel as the first
            [0.25, 0.01, 0.01],   # different voxel
            [0.01, 0.01, 0.01],   # scene 1, same relative voxel
        ],
        np.float32,
    )
    pt = _batch(coords, [0, 0, 0, 1], num_points=8)
    lvl0 = pyr.Level(point=pt)
    lvl = pyr.build_metric_level(lvl0, grid_size=0.1, capacity=8)

    mask = np.asarray(lvl.point.mask)
    assert mask.sum() == 3  # 2 clusters scene 0 + 1 cluster scene 1
    batch = np.asarray(lvl.point.batch)[mask]
    assert sorted(batch.tolist()) == [0, 0, 1]

    # mean coordinate of the merged pair
    coord = np.asarray(lvl.point.coord)[mask]
    merged = coord[np.isclose(coord[:, 0], 0.03, atol=1e-5)]
    assert len(merged) == 1
    np.testing.assert_allclose(merged[0], [0.03, 0.03, 0.03], atol=1e-5)

    # pooling reduces parent features, unpooling broadcasts back
    feat = jnp.asarray(
        np.array([[1.0], [5.0], [2.0], [7.0], [0], [0], [0], [0]], np.float32)
    )
    pooled = np.asarray(pyr.pool_features(feat, lvl, reduce="max"))
    assert set(pooled[mask, 0].tolist()) == {5.0, 2.0, 7.0}
    up = np.asarray(pyr.unpool_features(jnp.asarray(pooled), lvl))
    assert up[0, 0] == 5.0 and up[1, 0] == 5.0  # both members get the max
    assert up[2, 0] == 2.0 and up[3, 0] == 7.0


def test_metric_level_per_scene_min_origin():
    """Voxelization is relative to each scene's min corner (reference
    `start = segment_csr(..., 'min')`): a rigid per-scene translation does
    not change the clustering."""
    rng = np.random.RandomState(0)
    base = rng.rand(20, 3).astype(np.float32)
    pt_a = _batch(
        np.concatenate([base, base + 100.0]), [0] * 20 + [1] * 20, 48
    )
    pt_b = _batch(
        np.concatenate([base + 3.33, base + 77.7]), [0] * 20 + [1] * 20, 48
    )
    la = pyr.build_metric_level(pyr.Level(point=pt_a), 0.25, 32)
    lb = pyr.build_metric_level(pyr.Level(point=pt_b), 0.25, 32)
    assert np.asarray(la.point.mask).sum() == np.asarray(lb.point.mask).sum()
    np.testing.assert_array_equal(
        np.asarray(la.pool_seg), np.asarray(lb.pool_seg)
    )


def test_metric_pyramid_overflow_truncates():
    """Clusters beyond capacity land in the invalid trash slot, and
    unpooling zeroes their members."""
    rng = np.random.RandomState(1)
    coords = (rng.rand(30, 3) * 10).astype(np.float32)  # ~30 distinct voxels
    pt = _batch(coords, [0] * 30, 32)
    lvl = pyr.build_metric_level(pyr.Level(point=pt), 0.5, capacity=8)
    mask = np.asarray(lvl.point.mask)
    assert mask.sum() <= 7  # last slot is always the trash slot
    feat = jnp.asarray(rng.rand(32, 2).astype(np.float32))
    up = np.asarray(pyr.unpool_features(pyr.pool_features(feat, lvl), lvl))
    assert np.isfinite(up).all()
