"""PointBatch serialization, neighbor tables, pyramid pooling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cdsegnet_tpu.models import pyramid as pyr
from cdsegnet_tpu.models.structure import build_neighbor_table, kernel_offsets, serialize
from helpers import synthetic_batch

ORDERS = ("z", "z-trans", "hilbert", "hilbert-trans")


def test_serialize_orders_and_inverse(rng):
    pt = synthetic_batch(rng)
    pt = serialize(pt, orders=ORDERS, shuffle_key=None)
    codes = np.asarray(pt.codes)
    orders = np.asarray(pt.orders)
    inv = np.asarray(pt.inverses)
    for o in range(4):
        sorted_codes = codes[o][orders[o]]
        assert (np.diff(sorted_codes) >= 0).all()
        # the packed sort's key half equals a fresh gather
        np.testing.assert_array_equal(
            np.asarray(pt.codes_sorted)[o], sorted_codes
        )
        # inverse is the inverse permutation
        np.testing.assert_array_equal(orders[o][inv[o]], np.arange(pt.num_points))
    # pads sort to the end of every order
    mask = np.asarray(pt.mask)
    n_real = mask.sum()
    for o in range(4):
        assert not mask[orders[o][n_real:]].any()
        assert mask[orders[o][:n_real]].all()


def test_serialize_shuffle_is_permutation(rng, key):
    pt = synthetic_batch(rng)
    a = serialize(pt, orders=ORDERS, shuffle_key=None)
    b = serialize(pt, orders=ORDERS, shuffle_key=key)
    ca, cb = np.asarray(a.codes), np.asarray(b.codes)
    # every row of b.codes equals some row of a.codes
    for row in cb:
        assert any(np.array_equal(row, r) for r in ca)


def test_neighbor_table_bruteforce(rng):
    pt = synthetic_batch(rng, counts=(60, 40), num_points=128)
    nbr = np.asarray(
        build_neighbor_table(pt.grid_coord, pt.batch, pt.mask, depth=pt.depth, kernel_size=3)
    )
    gc = np.asarray(pt.grid_coord)
    bt = np.asarray(pt.batch)
    mask = np.asarray(pt.mask)
    offs = np.asarray(kernel_offsets(3))
    lut = {}
    for i in range(pt.num_points):
        if mask[i]:
            lut[(bt[i], *gc[i])] = i
    for i in range(pt.num_points):
        for k in range(27):
            q = gc[i] + offs[k]
            expect = pt.num_points
            if mask[i] and (q >= 0).all() and (q < (1 << pt.depth)).all():
                expect = lut.get((bt[i], *q), pt.num_points)
            assert nbr[i, k] == expect, (i, k)


def test_pyramid_pooling_bruteforce(rng, key):
    pt = synthetic_batch(rng, counts=(150, 90), num_points=320)
    levels, stem = pyr.build_pyramid(
        pt, strides=(2, 2), capacities=(256, 256), orders=ORDERS, shuffle_key=None
    )
    l1 = levels[1]
    gc = np.asarray(pt.grid_coord)
    bt = np.asarray(pt.batch)
    mask = np.asarray(pt.mask)
    # brute force clusters: (batch, coarse voxel)
    clusters = {}
    for i in range(pt.num_points):
        if mask[i]:
            clusters.setdefault((bt[i], *(gc[i] >> 1)), []).append(i)
    m1 = np.asarray(l1.point.mask)
    assert m1.sum() == len(clusters)
    # pooled grid coords are the cluster voxels, batch correct
    got = set()
    g1 = np.asarray(l1.point.grid_coord)
    b1 = np.asarray(l1.point.batch)
    for j in range(l1.size):
        if m1[j]:
            got.add((b1[j], *g1[j]))
    assert got == set(clusters.keys())
    # feature max-pool parity
    feat = np.asarray(pt.feat)
    pooled = np.asarray(pyr.pool_features(pt.feat, l1, reduce="max"))
    for j in range(l1.size):
        if m1[j]:
            members = clusters[(b1[j], *g1[j])]
            np.testing.assert_allclose(
                pooled[j], feat[members].max(axis=0), rtol=1e-6
            )
        else:
            np.testing.assert_array_equal(pooled[j], 0)
    # parent_inverse maps members to the right slot
    pinv = np.asarray(l1.parent_inverse)
    for j in range(l1.size):
        if m1[j]:
            for i in clusters[(b1[j], *g1[j])]:
                assert pinv[i] == j
    # unpool broadcasts slot features to members
    up = np.asarray(pyr.unpool_features(pooled, l1))
    for i in range(pt.num_points):
        if mask[i]:
            np.testing.assert_allclose(up[i], pooled[pinv[i]], rtol=1e-6)
    # level-2 chains correctly: grid coords are level-1 coords >> 1
    l2 = levels[2]
    m2 = np.asarray(l2.point.mask)
    clusters2 = set()
    for i in range(pt.num_points):
        if mask[i]:
            clusters2.add((bt[i], *(gc[i] >> 2)))
    assert m2.sum() == len(clusters2)


def test_pooling_overflow_goes_to_trash(rng):
    pt = synthetic_batch(rng, counts=(150,), num_points=256)
    # capacity far too small: overflow clusters must be dropped, not aliased
    levels, _ = pyr.build_pyramid(
        pt, strides=(2,), capacities=(16,), orders=ORDERS, shuffle_key=None
    )
    l1 = levels[1]
    m1 = np.asarray(l1.point.mask)
    assert not m1[-1]  # trash slot always invalid
    pooled = np.asarray(pyr.pool_features(pt.feat, l1))
    np.testing.assert_array_equal(pooled[-1], 0)


def test_pooled_orders_are_valid_permutations(rng):
    """Sort-free derived child orders must be permutations that sort codes."""
    pt = synthetic_batch(rng, counts=(150, 90), num_points=320)
    levels, _ = pyr.build_pyramid(
        pt, strides=(2, 2), capacities=(256, 256), orders=ORDERS, shuffle_key=None
    )
    for lvl in levels[1:]:
        codes = np.asarray(lvl.point.codes)
        orders = np.asarray(lvl.point.orders)
        inv = np.asarray(lvl.point.inverses)
        m = lvl.size
        for o in range(4):
            assert sorted(orders[o].tolist()) == list(range(m))
            np.testing.assert_array_equal(orders[o][inv[o]], np.arange(m))
            sorted_codes = codes[o][orders[o]]
            assert (np.diff(sorted_codes.astype(np.int64)) >= 0).all()
            # propagated sorted codes match a fresh gather
            np.testing.assert_array_equal(
                np.asarray(lvl.point.codes_sorted)[o], sorted_codes
            )
        # valid slots sort before invalid ones in every order
        mask = np.asarray(lvl.point.mask)
        n_valid = mask.sum()
        for o in range(4):
            assert mask[orders[o][:n_valid]].all()


def test_compose_k5_vs_exact(rng):
    """Composed k5 table equals the exact build wherever a 1-hop path exists."""
    from cdsegnet_tpu.models.structure import compose_k5_table

    # dense-ish blob: most intermediates occupied
    pt = synthetic_batch(rng, counts=(120,), num_points=128, depth=4)
    n3 = build_neighbor_table(pt.grid_coord, pt.batch, pt.mask, depth=4, kernel_size=3)
    exact = np.asarray(
        build_neighbor_table(pt.grid_coord, pt.batch, pt.mask, depth=4, kernel_size=5)
    )
    composed = np.asarray(compose_k5_table(n3))
    n3 = np.asarray(n3)
    n = pt.num_points
    found = composed < n
    # every composed hit must equal the exact neighbor
    np.testing.assert_array_equal(composed[found], exact[found])
    # brute-force reachability over ALL 729 (a, b) two-hop paths: a missing
    # composed entry must truly have no occupied 1-hop intermediate
    offs3 = [(x, y, z) for x in (-1, 0, 1) for y in (-1, 0, 1) for z in (-1, 0, 1)]
    offs5 = [
        (x, y, z)
        for x in range(-2, 3) for y in range(-2, 3) for z in range(-2, 3)
    ]
    idx5 = {o: j for j, o in enumerate(offs5)}
    guard = np.concatenate([n3, np.full((1, 27), n, n3.dtype)])
    reach = np.full((n, 125), n, n3.dtype)
    for a in range(27):
        rows_a = guard[n3[:, a]]  # (N, 27) second hop from intermediate a
        for b in range(27):
            j = idx5[tuple(np.add(offs3[a], offs3[b]))]
            reach[:, j] = np.minimum(reach[:, j], rows_a[:, b])
    missing_but_reachable = (composed == n) & (reach < n)
    assert not missing_but_reachable.any()
    # and every reachable entry is found (full two-hop closure)
    np.testing.assert_array_equal(composed, reach)


def test_parity_tables_match_sorted_builders(rng):
    """The multigrid parity gather reproduces the sort-based exact tables —
    k3 at every level and the k5 stem — bit for bit (generous capacities, so
    no overflow drops)."""
    pt = synthetic_batch(rng, counts=(150, 90), num_points=320, depth=6)
    levels, stem = pyr.build_pyramid(
        pt, strides=(2, 2, 2), capacities=(320, 320, 320), orders=ORDERS,
        shuffle_key=None, stem_kernel=5,
    )
    for lvl in levels[:-1]:  # coarsest is itself sort-based
        p = lvl.point
        want = build_neighbor_table(
            p.grid_coord, p.batch, p.mask, depth=p.depth, kernel_size=3,
            num_scenes=p.num_scenes,
        )
        np.testing.assert_array_equal(
            np.asarray(p.neighbor_idx), np.asarray(want)
        )
    want5 = build_neighbor_table(
        pt.grid_coord, pt.batch, pt.mask, depth=pt.depth, kernel_size=5,
        num_scenes=pt.num_scenes,
    )
    np.testing.assert_array_equal(np.asarray(stem), np.asarray(want5))


def test_tables_exact_under_overflow(rng):
    """Cluster-capacity overflow must NOT corrupt neighbor tables: when a
    stride-2 child level drops points, `build_pyramid` falls back to the
    sorted exact build (`lax.cond` on `Level.dropped`) and every level's
    table — including the k5 stem — matches the sorted ground truth bit for
    bit. Guards against the round-3 `2f480b2` regression, where the parity
    gather silently lost overflowed points' whole neighborhoods and stalled
    flagship training."""
    pt = synthetic_batch(rng, counts=(150,), num_points=256, depth=6)
    levels, stem = pyr.build_pyramid(
        pt, strides=(2, 2), capacities=(64, 64), orders=ORDERS,
        shuffle_key=None, stem_kernel=5,
    )
    assert int(levels[1].dropped) > 0  # capacity 64 must overflow 150 points
    for lvl in levels:
        p = lvl.point
        want = build_neighbor_table(
            p.grid_coord, p.batch, p.mask, depth=p.depth, kernel_size=3,
            num_scenes=p.num_scenes,
        )
        np.testing.assert_array_equal(
            np.asarray(p.neighbor_idx), np.asarray(want)
        )
    want5 = build_neighbor_table(
        pt.grid_coord, pt.batch, pt.mask, depth=pt.depth, kernel_size=5
    )
    np.testing.assert_array_equal(np.asarray(stem), np.asarray(want5))


def test_dropped_counts(rng):
    """Level.dropped equals the brute-force count of valid parents whose
    cluster ranked at or beyond capacity-1 (the trash slot)."""
    pt = synthetic_batch(rng, counts=(150,), num_points=256, depth=6)
    levels, _ = pyr.build_pyramid(
        pt, strides=(2,), capacities=(64,), orders=ORDERS, shuffle_key=None,
        stem_kernel=3,
    )
    l1 = levels[1]
    mask = np.asarray(pt.mask)
    # cluster rank along the first sort order: clusters in ascending order
    # of coarse code; those ranked >= 63 overflow
    sort0 = np.asarray(l1.pool_sort)
    keys = np.asarray(levels[0].point.codes[0] >> 3)[sort0]
    seg = np.cumsum(np.concatenate([[0], (np.diff(keys) != 0).astype(int)]))
    dropped_bf = int((mask[sort0] & (seg >= l1.size - 1)).sum())
    assert dropped_bf > 0
    assert int(l1.dropped) == dropped_bf
    # generous capacity: nothing dropped
    levels2, _ = pyr.build_pyramid(
        pt, strides=(2,), capacities=(256,), orders=ORDERS, shuffle_key=None,
        stem_kernel=3,
    )
    assert int(levels2[1].dropped) == 0


def test_windowed_max_covers_run_bound():
    """_windowed_max(window) == running max over the trailing `window`
    positions — the bounded propagation used by exact_match_lookup."""
    from cdsegnet_tpu.models.structure import _windowed_max

    rng = np.random.RandomState(7)
    for m, w in ((1, 1), (17, 3), (1000, 14), (5000, 50)):
        x = rng.randint(-(1 << 40), 1 << 40, size=m).astype(np.int64)
        got = np.asarray(_windowed_max(jnp.asarray(x), w))
        # expected coverage: the next power of two >= w
        cov = 1
        while cov < w:
            cov *= 2
        want = np.array(
            [x[max(0, i - cov + 1): i + 1].max() for i in range(m)]
        )
        np.testing.assert_array_equal(got, want)


def test_exact_match_lookup_bounded_run():
    """max_run-bounded lookup agrees with the exact scan path when each
    code's run respects the bound (the neighbor-table invariant)."""
    from cdsegnet_tpu.models.structure import exact_match_lookup

    rng = np.random.RandomState(11)
    nk, per = 64, 5
    keys = np.sort(rng.choice(1 << 16, size=nk, replace=False)).astype(np.int64)
    # up to `per` queries per key + some misses
    queries = np.concatenate(
        [np.repeat(keys, rng.randint(0, per + 1, size=nk)), keys + (1 << 17)]
    ).astype(np.int64)
    rng.shuffle(queries)
    ki = jnp.arange(nk, dtype=jnp.int32)
    kj, qj = jnp.asarray(keys), jnp.asarray(queries)
    exact = np.asarray(
        exact_match_lookup(kj, ki, qj, key_bits=18, missing=nk)
    )
    bounded = np.asarray(
        exact_match_lookup(kj, ki, qj, key_bits=18, missing=nk, max_run=per)
    )
    np.testing.assert_array_equal(exact, bounded)
    # ground truth
    lut = {int(k): i for i, k in enumerate(keys)}
    want = np.array([lut.get(int(q), nk) for q in queries])
    np.testing.assert_array_equal(bounded, want)


def test_duplicate_voxels_fail_loudly(rng):
    """Deliberately duplicated voxels (violating the GridSample uniqueness
    invariant the neighbor tables' max_run bound and mirror halving rest on)
    must fail LOUDLY, never silently: `assert_unique_voxels` — the
    host-side data-boundary fence (an in-jit check implies a `lax.cond`
    fallback that was measured to explode XLA compile time; see
    `exact_match_lookup`'s contract) — raises naming the offending scene,
    and clean data passes untouched."""
    from cdsegnet_tpu.models.structure import assert_unique_voxels

    pt = synthetic_batch(rng, counts=(60, 40), num_points=128)
    # clean fixture: passes
    assert_unique_voxels(pt.grid_coord, pt.batch, pt.mask)
    gc = np.asarray(pt.grid_coord).copy()
    # points 5..14 all collapse onto point 4's voxel (an equal-code run of
    # 11 keys, far past the k3 run bound of 13+1)
    gc[5:15] = gc[4]
    with pytest.raises(ValueError, match="duplicate voxels"):
        assert_unique_voxels(gc, pt.batch, pt.mask, where="test batch")
    # duplicates hidden at padding slots don't count
    gc2 = np.asarray(pt.grid_coord).copy()
    mask = np.asarray(pt.mask)
    pads = np.where(~mask)[0]
    gc2[pads] = gc2[0]
    assert_unique_voxels(gc2, pt.batch, pt.mask)
    # no-op under trace (cannot host-check a tracer)
    jax.jit(
        lambda g, b, m: (assert_unique_voxels(g, b, m), g)[1]
    )(jnp.asarray(gc), pt.batch, pt.mask)


def test_blocked_cummax():
    """_blocked_cummax == np.maximum.accumulate at awkward sizes (the
    associative_scan replacement that keeps TPU compile time bounded)."""
    import numpy as np
    import jax.numpy as jnp

    from cdsegnet_tpu.models.structure import _blocked_cummax

    rng = np.random.RandomState(3)
    for m in (1, 5, 4096, 4097, 10000, 1 << 17):
        x = rng.randint(-(1 << 60), 1 << 60, size=m).astype(np.int64)
        got = np.asarray(_blocked_cummax(jnp.asarray(x), chunk=4096))
        np.testing.assert_array_equal(got, np.maximum.accumulate(x))


def test_pyramid_exactness_modes():
    """`build_pyramid(exactness=...)`: "parity" equals "cond" when nothing
    overflows; "sorted" equals "cond" when something does (the host-side
    fallback protocol used by inference drivers — bench.py geometry)."""
    import jax
    import numpy as np

    from cdsegnet_tpu.models import pyramid as pyr

    sys_path_ok = True  # local import guard
    from helpers import synthetic_batch

    rng = np.random.RandomState(0)
    pt = synthetic_batch(rng, counts=(150, 90), num_points=256, depth=6)
    orders = ("z", "z-trans", "hilbert", "hilbert-trans")

    def build(exactness, caps):
        return jax.jit(lambda p: pyr.build_pyramid(
            p, strides=(2, 2), capacities=caps, orders=orders,
            shuffle_key=None, exactness=exactness,
        ))(pt)

    def tables(g):
        levels, stem = g
        return [np.asarray(l.point.neighbor_idx) for l in levels] + [
            np.asarray(stem)
        ]

    # ample capacities: nothing drops -> parity == cond
    caps = [256, 256]
    g_cond, g_par = build("cond", caps), build("parity", caps)
    assert all(int(np.asarray(l.dropped)) == 0 for l in g_cond[0][1:])
    for a, b in zip(tables(g_cond), tables(g_par)):
        np.testing.assert_array_equal(a, b)

    # tight capacity: drops -> cond takes the sorted branch == "sorted"
    caps = [64, 64]
    g_cond, g_sort = build("cond", caps), build("sorted", caps)
    assert any(int(np.asarray(l.dropped)) > 0 for l in g_cond[0][1:])
    for a, b in zip(tables(g_cond), tables(g_sort)):
        np.testing.assert_array_equal(a, b)
    del sys_path_ok
