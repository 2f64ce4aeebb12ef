"""pointops (kNN / ball query / FPS / interpolation) vs numpy brute force."""

import jax.numpy as jnp
import numpy as np

from cdsegnet_tpu.ops import pointops as po


def test_knn_bruteforce(rng):
    q = rng.randn(100, 3).astype(np.float32)
    r = rng.randn(80, 3).astype(np.float32)
    rmask = np.arange(80) < 60
    idx, d2 = po.knn(jnp.asarray(q), jnp.asarray(r), 4, ref_mask=jnp.asarray(rmask), chunk=32)
    idx, d2 = np.asarray(idx), np.asarray(d2)
    dd = ((q[:, None, :] - r[None, :60, :]) ** 2).sum(-1)
    want = np.argsort(dd, axis=1)[:, :4]
    for i in range(100):
        assert set(idx[i]) == set(want[i]), i
        np.testing.assert_allclose(np.sort(d2[i]), np.sort(dd[i][want[i]]), rtol=1e-4)


def test_ball_query(rng):
    q = rng.rand(50, 3).astype(np.float32)
    r = rng.rand(200, 3).astype(np.float32)
    radius = 0.3
    idx, d2 = po.ball_query(jnp.asarray(q), jnp.asarray(r), radius, 8, chunk=32)
    idx, d2 = np.asarray(idx), np.asarray(d2)
    for i in range(50):
        dd = ((q[i] - r[idx[i]]) ** 2).sum(-1)
        assert (dd <= radius**2 + 1e-5).all()


def test_fps_spread(rng):
    # FPS on a line must pick well-separated points
    coord = np.zeros((64, 3), np.float32)
    coord[:, 0] = np.arange(64)
    sel = np.asarray(po.farthest_point_sampling(jnp.asarray(coord), 4, start=0))
    assert sel[0] == 0 and 63 in sel
    # all selected distinct
    assert len(set(sel.tolist())) == 4


def test_three_interpolation_exact(rng):
    src = rng.rand(50, 3).astype(np.float32)
    feat = rng.randn(50, 8).astype(np.float32)
    # targets exactly at sources -> interpolation reproduces features
    out = np.asarray(
        po.three_interpolation(jnp.asarray(src), jnp.asarray(src), jnp.asarray(feat))
    )
    np.testing.assert_allclose(out, feat, rtol=1e-3, atol=1e-4)


def test_knn_remap(rng):
    src = rng.rand(40, 3).astype(np.float32)
    pred = rng.randint(0, 5, size=(40,)).astype(np.int32)
    tgt = src + 1e-4  # nearly identical positions
    out = np.asarray(
        po.knn_remap_labels(jnp.asarray(tgt), jnp.asarray(src), jnp.asarray(pred))
    )
    np.testing.assert_array_equal(out, pred)


def test_knn_scene_separation(rng):
    # two overlapping scenes: with batch ids, neighbors never cross scenes
    q = rng.rand(120, 3).astype(np.float32)
    batch = (np.arange(120) >= 70).astype(np.int32)
    mask = np.ones(120, bool)
    mask[110:] = False
    idx, d2 = po.knn(
        jnp.asarray(q), jnp.asarray(q), 6,
        jnp.asarray(mask), jnp.asarray(mask), chunk=32,
        query_batch=jnp.asarray(batch), ref_batch=jnp.asarray(batch),
    )
    idx = np.asarray(idx)
    for i in range(110):
        for j in idx[i]:
            assert j < 120 and batch[j] == batch[i] and mask[j], (i, j)
    # brute force within each scene
    for i in range(110):
        same = np.where((batch == batch[i]) & mask)[0]
        dd = ((q[i] - q[same]) ** 2).sum(-1)
        want = set(same[np.argsort(dd)[:6]].tolist())
        assert set(idx[i].tolist()) == want, i
    # invalid queries return the guard row
    assert (np.asarray(idx)[110:] == 120).all()


def test_fps_batched_quota(rng):
    # per-scene quotas: count_s // stride samples, each an independent FPS set
    counts = (96, 52)
    n = 160
    coord = np.zeros((n, 3), np.float32)
    coord[:96] = rng.rand(96, 3)
    coord[96:148] = rng.rand(52, 3) + 5.0
    batch = np.concatenate([np.zeros(96, np.int32), np.ones(52, np.int32),
                            np.zeros(12, np.int32)])
    mask = np.arange(n) < 148
    sel = np.asarray(po.farthest_point_sampling_batched(
        jnp.asarray(coord), jnp.asarray(batch), jnp.asarray(mask),
        48, 4, 2,
    ))
    got = sel[sel < n]
    assert len(set(got.tolist())) == len(got)  # no repeats
    s0 = got[batch[got] == 0]
    s1 = got[batch[got] == 1]
    assert len(s0) == 96 // 4 and len(s1) == 52 // 4
    assert mask[got].all()
    # FPS property per scene: matches independent single-scene FPS set
    for scene, picks in ((0, s0), (1, s1)):
        pts = np.where((batch == scene) & mask)[0]
        solo = np.asarray(po.farthest_point_sampling(
            jnp.asarray(coord[pts]), len(picks), start=0,
        ))
        assert set(pts[solo].tolist()) == set(picks.tolist()), scene
