"""Data pipeline tests: transforms, grid sampling, collation, Mix3D."""

import numpy as np

from cdsegnet_tpu.data.collate import collate_scenes, collate_sharded, mix3d, pick_bucket
from cdsegnet_tpu.data.transforms import TRANSFORMS, Compose, fnv_hash_vec


def _scene(rng, n=500):
    return dict(
        coord=rng.rand(n, 3).astype(np.float64) * 4,
        color=rng.rand(n, 3).astype(np.float64) * 255,
        normal=rng.randn(n, 3).astype(np.float64),
        segment=rng.randint(0, 5, size=(n,)).astype(np.int64),
    )


def test_grid_sample_train(rng):
    g = np.random.default_rng(0)
    data = _scene(rng)
    t = TRANSFORMS.build(dict(type="GridSample", grid_size=0.5, mode="train",
                              return_grid_coord=True))
    out = t(dict(data), g)
    # one point per occupied voxel, grid coords unique
    gc = out["grid_coord"]
    assert len(np.unique(gc.view([("", gc.dtype)] * 3))) == len(gc)
    assert out["coord"].shape[0] == gc.shape[0]
    assert out["segment"].shape[0] == gc.shape[0]
    # voxel ids match the floor of scaled original coords
    lo = np.floor(data["coord"] / 0.5).min(0)
    voxels = set(map(tuple, (np.floor(data["coord"] / 0.5) - lo).astype(int)))
    assert set(map(tuple, gc)) == voxels


def test_grid_sample_test_fragments(rng):
    g = np.random.default_rng(0)
    data = _scene(rng, 300)
    t = TRANSFORMS.build(dict(type="GridSample", grid_size=0.3, mode="test",
                              keys=("coord", "color", "segment"),
                              return_grid_coord=True))
    frags = t(dict(data), g)
    assert isinstance(frags, list) and len(frags) >= 1
    # union of fragment indices covers every point exactly the right number
    seen = np.concatenate([f["index"] for f in frags])
    assert set(seen.tolist()) == set(range(300))


def test_transform_pipeline_runs(rng):
    g = np.random.default_rng(0)
    pipeline = Compose([
        dict(type="CenterShift", apply_z=True),
        dict(type="RandomDropout", dropout_ratio=0.2, dropout_application_ratio=1.0),
        dict(type="RandomRotate", angle=[-1, 1], axis="z", p=1.0),
        dict(type="RandomScale", scale=[0.9, 1.1]),
        dict(type="RandomFlip", p=0.5),
        dict(type="RandomJitter", sigma=0.005, clip=0.02),
        dict(type="ElasticDistortion"),
        dict(type="ChromaticAutoContrast", p=1.0),
        dict(type="ChromaticTranslation", p=1.0),
        dict(type="ChromaticJitter", p=1.0),
        dict(type="GridSample", grid_size=0.1, mode="train", return_grid_coord=True),
        dict(type="SphereCrop", point_max=128, mode="random"),
        dict(type="CenterShift", apply_z=False),
        dict(type="NormalizeColor"),
        dict(type="Collect", keys=("coord", "grid_coord", "segment"),
             feat_keys=("color", "normal")),
    ])
    out = pipeline(_scene(rng), g)
    n = out["coord"].shape[0]
    assert n <= 128
    assert out["feat"].shape == (n, 6)
    assert out["grid_coord"].shape == (n, 3)
    assert (np.abs(out["feat"][:, :3]) <= 1.0 + 1e-6).all()  # normalized color


def test_collate_and_mix3d(rng):
    g = np.random.default_rng(0)
    scenes = []
    for i in range(4):
        n = 50 + i * 10
        # unique voxels per scene (the GridSample invariant); scenes still
        # overlap each other, so the merge has coincident voxels to dedupe
        cells = rng.choice(16 ** 3, size=n, replace=False)
        grid = np.stack(
            [cells // 256, (cells // 16) % 16, cells % 16], axis=1
        ).astype(np.int32)
        scenes.append(dict(
            coord=rng.rand(n, 3).astype(np.float32),
            grid_coord=grid,
            feat=rng.randn(n, 6).astype(np.float32),
            segment=rng.randint(0, 5, size=(n,)).astype(np.int32),
        ))
    mixed = mix3d(list(scenes), g, mix_prob=1.0)
    assert len(mixed) == 2  # pairs merged
    # coincident voxels of the merged pair deduplicate first-wins (the
    # neighbor-table contract: voxels unique per scene)
    union = np.concatenate(
        [scenes[0]["grid_coord"], scenes[1]["grid_coord"]]
    )
    n_unique = len(np.unique(union, axis=0))
    assert mixed[0]["coord"].shape[0] == n_unique <= 50 + 60
    m_grid = mixed[0]["grid_coord"]
    assert len(np.unique(m_grid, axis=0)) == len(m_grid)
    # first-wins: every scene-a point survives
    assert (m_grid[:50] == scenes[0]["grid_coord"]).all()
    batch = collate_scenes(mixed, num_points=512, num_scenes=2)
    assert batch["coord"].shape == (512, 3)
    assert batch["mask"].sum() == sum(s["coord"].shape[0] for s in mixed)
    # padding slots carry sentinel batch id and ignore labels
    assert (batch["batch"][~batch["mask"]] == 2).all()
    assert (batch["segment"][~batch["mask"]] == -1).all()
    sharded = collate_sharded([mixed[:1], mixed[1:]], 512, 1)
    assert sharded["coord"].shape == (2, 512, 3)


def test_pick_bucket():
    assert pick_bucket(100, [128, 256, 512]) == 128
    assert pick_bucket(200, [128, 256, 512]) == 256
    assert pick_bucket(9999, [128, 256, 512]) == 512


def test_native_hash_parity(rng):
    from cdsegnet_tpu.data import native

    g = rng.randint(0, 1000, size=(500, 3)).astype(np.int32)
    np.testing.assert_array_equal(native.fnv_hash(g), fnv_hash_vec(g))
