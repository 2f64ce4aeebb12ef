"""PPT / PDNorm / PTv2-variant tests: per-condition normalization, the
language-guided and decoupled multi-dataset heads, and the per-dataset
train-step dispatch."""

import jax
import jax.numpy as jnp
import numpy as np

from cdsegnet_tpu.models.builder import build_model
from helpers import synthetic_batch
from test_model import RNGS

SPUNET_PD = dict(
    type="SpUNet-v1m3", in_channels=6, num_classes=0, base_channels=8,
    channels=(8, 8, 16, 16, 16, 16, 8, 8), layers=(1, 1, 1, 1, 1, 1, 1, 1),
    capacity_div=(1, 2, 4, 8, 8), num_conditions=3, pdnorm_adaptive=True,
)


def test_ptv2_m1_grouped_weight(rng):
    """PT-v2m1's GroupedLinear weight encoding trains and differs from m2."""
    pt = synthetic_batch(rng, counts=(80, 60), num_points=160, depth=6)
    cfg = dict(type="PT-v2m1", in_channels=6, num_classes=5,
               patch_embed_channels=8, patch_embed_groups=2,
               enc_channels=(8, 16), enc_depths=(1, 1),
               enc_groups=(2, 4), dec_channels=(8, 8), dec_depths=(1, 1),
               dec_groups=(2, 2), k_neighbors=8, capacity_div=(1, 2, 4))
    model = build_model(cfg)
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(RNGS, pt)
    # grouped encoding creates the per-channel weight, not weight_fc2
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    names = {"/".join(str(k.key) for k in path) for path, _ in flat}
    assert any("grouped_weight" in n for n in names)
    assert not any("weight_fc2" in n for n in names)
    out = jax.jit(lambda v, p: model.apply(v, p, train=False))(variables, pt)
    assert out.feat.shape == (160, 5)
    assert np.isfinite(np.asarray(out.feat)).all()


def test_pdnorm_condition_selection(rng):
    """PDNorm backbones: different conditions select different normalization
    parameters/stats; only the active condition's running stats advance."""
    pt = synthetic_batch(rng, counts=(100,), num_points=128, depth=6)
    model = build_model(SPUNET_PD)
    ctx = jnp.ones((1, 256), jnp.float32)
    variables = jax.jit(
        lambda r, p: model.init(r, p, train=False, condition=0, context=ctx)
    )(RNGS, pt)

    def fwd(cond):
        return model.apply(variables, pt, train=False, condition=cond,
                           context=ctx)

    o0 = jax.jit(fwd, static_argnums=0)(0)
    o1 = jax.jit(fwd, static_argnums=0)(1)
    # same params, but different per-condition scale/bias init are equal ->
    # outputs equal at init; perturb condition-1 scale to see divergence
    p = variables["params"]
    p = jax.tree_util.tree_map(lambda x: x, p)
    sb = p["stem_bn"]["scale"]
    p["stem_bn"]["scale"] = sb.at[1].mul(2.0)
    v2 = {"params": p, "batch_stats": variables["batch_stats"]}
    o0b = model.apply(v2, pt, train=False, condition=0, context=ctx)
    o1b = model.apply(v2, pt, train=False, condition=1, context=ctx)
    np.testing.assert_allclose(
        np.asarray(o0.feat), np.asarray(o0b.feat), rtol=1e-4, atol=1e-5
    )
    assert not np.allclose(np.asarray(o1.feat), np.asarray(o1b.feat))

    # train-mode stats: only condition 0's running mean moves
    _, mut = model.apply(
        variables, pt, train=True, condition=0, context=ctx,
        rngs=RNGS, mutable=["batch_stats"],
    )
    m = mut["batch_stats"]["stem_bn"]["mean"]
    m0_before = variables["batch_stats"]["stem_bn"]["mean"]
    assert not np.allclose(np.asarray(m[0]), np.asarray(m0_before[0]))
    np.testing.assert_allclose(np.asarray(m[1]), np.asarray(m0_before[1]))


def test_ppt_v1m1_language_head(rng):
    """PPT-v1m1: per-condition head widths follow valid_index; loss and
    grads (incl. embedding table + class embedding) are finite."""
    from cdsegnet_tpu.models.losses import Criteria

    pt = synthetic_batch(rng, counts=(100,), num_points=128, depth=6)
    model = build_model(dict(
        type="PPT-v1m1", backbone=SPUNET_PD, backbone_out_channels=8,
        context_channels=256, clip_embed_dim=16,
        conditions=("Structured3D", "ScanNet", "S3DIS"),
    ))
    variables = jax.jit(
        lambda r, p: model.init(r, p, train=False, condition=0)
    )(RNGS, pt)
    from cdsegnet_tpu.models.ppt import DEFAULT_VALID_INDEX

    for cond in range(3):
        out = jax.jit(
            lambda v, p, c: model.apply(v, p, train=False, condition=c),
            static_argnums=2,
        )(variables, pt, cond)
        assert out["n_pred"].shape == (128, len(DEFAULT_VALID_INDEX[cond]))
        assert np.isfinite(np.asarray(out["n_pred"])).all()

    criteria = Criteria([dict(type="CrossEntropyLoss", loss_weight=1.0)])

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pt, train=True, condition=1, rngs=RNGS, mutable=["batch_stats"],
        )
        return criteria(out)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert np.isfinite(float(loss)) and float(loss) > 0
    for key in ("embedding_table", "class_embedding", "logit_scale"):
        g = grads[key]
        assert np.isfinite(np.asarray(g)).all(), key
    # context reaches the adaptive PDNorm -> embedding table gets gradient
    assert float(jnp.max(jnp.abs(grads["embedding_table"]))) > 0


def test_ppt_v1m2_decoupled_heads(rng):
    pt = synthetic_batch(rng, counts=(100,), num_points=128, depth=6)
    model = build_model(dict(
        type="PPT-v1m2", backbone=SPUNET_PD, backbone_out_channels=8,
        conditions=("Structured3D", "ScanNet", "S3DIS"),
        num_classes=(25, 20, 13),
    ))
    variables = jax.jit(
        lambda r, p: model.init(r, p, train=False, condition=0)
    )(RNGS, pt)
    for cond, ncls in ((0, 25), (1, 20), (2, 13)):
        out = jax.jit(
            lambda v, p, c: model.apply(v, p, train=False, condition=c),
            static_argnums=2,
        )(variables, pt, cond)
        assert out["n_pred"].shape == (128, ncls)
    # all three heads exist regardless of specialization
    for i in range(3):
        assert f"seg_head{i}" in variables["params"]


def test_multidataset_loader_tags(rng):
    """MultiDatasetLoader tags batches with their dataset index so the
    trainer can dispatch per-condition steps."""
    from cdsegnet_tpu.data.loader import MultiDatasetLoader, TrainLoader

    class TinyDS:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def get(self, i, rng):
            m = 32
            return dict(
                coord=np.random.rand(m, 3).astype(np.float32),
                feat=np.random.rand(m, 6).astype(np.float32),
                grid_coord=np.random.randint(0, 16, (m, 3)).astype(np.int32),
                segment=np.zeros(m, np.int32),
            )

    loaders = [
        TrainLoader(TinyDS(4), num_devices=1, scenes_per_device=1,
                    num_points=64, prefetch=0)
        for _ in range(2)
    ]
    ml = MultiDatasetLoader(loaders, [2, 1])
    tags = [b["_dataset_idx"] for b in ml.epoch(0)]
    assert set(tags) == {0, 1}
    # ratio 2:1 round-robin starts with two batches of dataset 0
    assert tags[:3] == [0, 0, 1]
    # reference semantics: the main dataset governs epoch length
    # (4 main batches // ratio 2 = 2 cycles of [0,0,1])
    assert tags == [0, 0, 1, 0, 0, 1]
    assert len(ml) == len(tags)


import pytest


@pytest.mark.slow
def test_multidataset_trainer_ppt_end_to_end(tmp_path):
    """MultiDatasetTrainer + PPT-v1m2: two synthetic datasets with different
    label spaces train jointly; per-condition steps dispatch on the loader's
    dataset tag and both decoupled heads receive updates."""
    from test_engine import _write_synthetic_dataset

    from cdsegnet_tpu.engine.config import Config
    from cdsegnet_tpu.engine.train import TRAINERS

    roots = [str(tmp_path / "ds0"), str(tmp_path / "ds1")]
    _write_synthetic_dataset(roots[0], n_scenes=4, num_classes=5, seed=0)
    _write_synthetic_dataset(roots[1], n_scenes=2, num_classes=4, seed=1)
    transform = [
        dict(type="GridSample", grid_size=0.05, hash_type="fnv", mode="train",
             return_grid_coord=True),
        dict(type="NormalizeColor"),
        dict(type="Collect", keys=("coord", "grid_coord", "segment"),
             feat_keys=("color", "normal")),
    ]
    cfg = Config(Config._wrap(dict(
        save_path=str(tmp_path / "exp"),
        seed=0, num_devices=1, scenes_per_device=2,
        bucket_num_points=1024, serialization_depth=7, epoch=1, resume=False,
        model=dict(
            type="PPT-v1m2",
            backbone=dict(
                type="SpUNet-v1m3", in_channels=6, num_classes=0,
                base_channels=8, channels=(8, 8, 16, 16, 16, 16, 8, 8),
                layers=(1, 1, 1, 1, 1, 1, 1, 1), capacity_div=(1, 2, 4, 8, 8),
                num_conditions=2, pdnorm_adaptive=True,
            ),
            backbone_out_channels=8, context_channels=32,
            conditions=("A", "B"), num_classes=(5, 4),
            criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0)],
        ),
        optimizer=dict(type="AdamW", lr=1e-3, weight_decay=0.01),
        scheduler=dict(type="OneCycleLR", pct_start=0.3),
        hooks=[dict(type="IterationTimer"), dict(type="InformationWriter")],
        data=dict(
            num_classes=5, ignore_index=-1,
            train=dict(
                type="ConcatDataset",
                datasets=[
                    dict(type="ScanNetDataset", split="train",
                         data_root=roots[0], transform=transform,
                         test_mode=False, condition="A", loop=1),
                    dict(type="ScanNetDataset", split="train",
                         data_root=roots[1], transform=transform,
                         test_mode=False, condition="B", loop=1),
                ],
            ),
        ),
    )))
    tr = TRAINERS.build(dict(type="MultiDatasetTrainer"), cfg=cfg)
    p0 = jax.tree_util.tree_map(np.asarray, tr.state.params)
    tr.train()
    assert int(tr.state.step) == tr.steps_per_epoch
    # both condition specializations were compiled and both heads updated
    assert set(tr._cond_steps) == {0, 1}
    p1 = tr.state.params
    for head in ("seg_head0", "seg_head1"):
        d = np.abs(np.asarray(p1[head]["kernel"]) - p0[head]["kernel"]).max()
        assert d > 0, head
