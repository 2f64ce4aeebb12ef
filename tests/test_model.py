"""End-to-end model tests on a tiny dual-branch config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cdsegnet_tpu.models.builder import build_model
from cdsegnet_tpu.models.losses import Criteria
from cdsegnet_tpu.models.segmentor import CNFSegmentor
from helpers import synthetic_batch

TINY_BACKBONE = dict(
    type="PT-v3m1",
    c_in_channels=6,
    n_in_channels=6,
    order=("z", "z-trans", "hilbert", "hilbert-trans"),
    c_stride=(4, 4),
    c_enc_depths=(1, 1, 1),
    c_enc_channels=(8, 16, 16),
    c_enc_num_head=(1, 2, 2),
    c_enc_patch_size=(64, 64, 64),
    c_dec_depths=(1, 1),
    c_dec_channels=(8, 8),
    c_dec_num_head=(1, 1),
    c_dec_patch_size=(64, 64),
    n_stride=(2, 2, 2, 2),
    n_enc_depths=(1, 1, 1, 1, 1),
    n_enc_channels=(8, 16, 16, 16, 16),
    n_enc_num_head=(1, 2, 2, 2, 2),
    n_enc_patch_size=(64, 64, 64, 64, 64),
    n_dec_depths=(1, 1, 1, 1),
    n_dec_channels=(8, 8, 16, 16),
    n_dec_num_head=(1, 1, 2, 2),
    n_dec_patch_size=(64, 64, 64, 64),
    mlp_ratio=2,
    drop_path=0.1,
    num_classes=5,
    T_dim=16,
    condition=True,
    skip_connection_mode="cat",
    skip_connection_scale=True,
    capacity_div=(1, 2, 4, 8, 8),
)

TINY_MODEL = dict(
    type="DefaultSegmentorV2",
    backbone=TINY_BACKBONE,
    num_classes=5,
    T=50,
    beta_start=0,
    beta_end=1000,
    noise_schedule="cosine",
    T_dim=16,
    dm=True,
    dm_input="xt",
    dm_target="noise",
    condition=True,
    c_in_channels=6,
)

RNGS = dict(
    params=jax.random.PRNGKey(0),
    dropout=jax.random.PRNGKey(1),
    shuffle=jax.random.PRNGKey(2),
    diffusion=jax.random.PRNGKey(3),
)


@pytest.fixture(scope="module")
def model_and_vars():
    rng = np.random.RandomState(0)
    pt = synthetic_batch(rng, counts=(150, 90), num_points=256, depth=6)
    model = build_model(TINY_MODEL)
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(RNGS, pt)
    return model, variables, pt


def test_train_forward_shapes(model_and_vars):
    model, variables, pt = model_and_vars
    out, mutated = jax.jit(
        lambda v, p: model.apply(v, p, train=True, rngs=RNGS, mutable=["batch_stats"])
    )(variables, pt)
    assert out["n_pred"].shape == (256, 5)
    assert out["c_pred"].shape == (256, 6)
    assert out["c_target"].shape == (256, 6)
    assert out["n_pred"].dtype == jnp.float32
    assert np.isfinite(np.asarray(out["n_pred"])).all()
    assert np.isfinite(np.asarray(out["c_pred"])).all()
    assert "batch_stats" in mutated


def test_ssi_inference(model_and_vars):
    model, variables, pt = model_and_vars
    out = jax.jit(
        lambda v, p: model.apply(
            v, p, method=CNFSegmentor.inference,
            rngs=dict(diffusion=jax.random.PRNGKey(7)),
        )
    )(variables, pt)
    assert out["seg_logits"].shape == (256, 5)
    assert np.isfinite(np.asarray(out["seg_logits"])).all()


def test_loss_and_grads(model_and_vars):
    model, variables, pt = model_and_vars
    criteria = Criteria(
        [
            dict(type="MSELoss", loss_weight=1.0),
            dict(type="CrossEntropyLoss", loss_weight=1.0),
            dict(type="LovaszLoss", loss_weight=1.0),
        ],
        loss_type="GLS",
        task_num=2,
    )

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pt, train=True, rngs=RNGS, mutable=["batch_stats"],
        )
        return criteria(out, mode="train")

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert np.isfinite(float(loss)) and float(loss) > 0
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # at least some gradient signal in both branches
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    c_norm = sum(
        float(jnp.abs(g).sum()) for p, g in flat if "c_enc" in jax.tree_util.keystr(p)
    )
    n_norm = sum(
        float(jnp.abs(g).sum()) for p, g in flat if "n_enc" in jax.tree_util.keystr(p)
    )
    assert c_norm > 0 and n_norm > 0


def test_no_float64_params(model_and_vars):
    _, variables, _ = model_and_vars
    for leaf in jax.tree_util.tree_leaves(variables):
        assert leaf.dtype != jnp.float64, leaf.dtype


def test_plain_ptv3(model_and_vars):
    _, _, pt = model_and_vars
    bb = dict(TINY_BACKBONE)
    bb["condition"] = False
    model = build_model(dict(type="DefaultSegmentor", backbone=bb))
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(RNGS, pt)
    out = jax.jit(lambda v, p: model.apply(v, p, train=False))(variables, pt)
    assert out["n_pred"].shape == (256, 5)
    assert np.isfinite(np.asarray(out["n_pred"])).all()


def test_rpe_attention(rng):
    """RPE-enabled small-patch attention runs and is finite."""
    from cdsegnet_tpu.models.ptv3 import SerializedAttention
    from cdsegnet_tpu.models.structure import serialize
    from helpers import synthetic_batch

    pt = synthetic_batch(rng, counts=(100, 60), num_points=192)
    pt = serialize(pt, orders=("z", "z-trans", "hilbert", "hilbert-trans"))
    pt = pt.replace(feat=jnp.asarray(np.random.RandomState(1).randn(192, 16), jnp.float32))
    mod = SerializedAttention(channels=16, num_heads=2, patch_size=48,
                              enable_rpe=True)
    variables = jax.jit(lambda r, p: mod.init(r, p))(dict(params=jax.random.PRNGKey(0)), pt)
    out = jax.jit(lambda v, p: mod.apply(v, p))(variables, pt)
    assert out.feat.shape == (192, 16)
    assert np.isfinite(np.asarray(out.feat)).all()


def test_freeu_and_restomer_options(rng):
    """FreeU skip filtering + Restomer cross attention compile and run."""
    from helpers import synthetic_batch

    pt = synthetic_batch(rng, counts=(150, 90), num_points=256, depth=6)
    bb = dict(TINY_BACKBONE)
    bb["b_factor"] = (1.2, 1.0, 1.0, 1.0)
    bb["s_factor"] = (0.9, 1.0, 1.0, 1.0)
    bb["tm_restomer"] = True
    model = build_model(dict(TINY_MODEL, backbone=bb))
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(RNGS, pt)
    out = jax.jit(
        lambda v, p: model.apply(v, p, train=True, rngs=RNGS, mutable=["batch_stats"])
    )(variables, pt)[0]
    assert np.isfinite(np.asarray(out["n_pred"])).all()


def test_remat_blocks_grads(rng):
    """Rematerialized blocks produce the same loss and finite grads."""
    from helpers import synthetic_batch
    from cdsegnet_tpu.models.losses import Criteria

    pt = synthetic_batch(rng, counts=(150, 90), num_points=256, depth=6)
    bb = dict(TINY_BACKBONE, remat_blocks=True, drop_path=0.0)
    model = build_model(dict(TINY_MODEL, backbone=bb))
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(RNGS, pt)
    criteria = Criteria(
        [dict(type="MSELoss"), dict(type="CrossEntropyLoss"),
         dict(type="LovaszLoss")], loss_type="GLS",
    )

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pt, train=True, rngs=RNGS, mutable=["batch_stats"],
        )
        return criteria(out, mode="train")

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree_util.tree_leaves(grads))


def test_ddim_msai_inference(model_and_vars):
    """MSAI multi-step DDIM inference runs and averages finite logits."""
    from cdsegnet_tpu.models.segmentor import inference_ddim

    model, variables, pt = model_and_vars
    logits = inference_ddim(
        model, variables, pt, jax.random.PRNGKey(11), step=3, mode="avg"
    )
    assert logits.shape == (256, 5)
    assert np.isfinite(np.asarray(logits)).all()
    final = inference_ddim(
        model, variables, pt, jax.random.PRNGKey(11), step=2, mode="final"
    )
    assert np.isfinite(np.asarray(final)).all()


def test_scan_blocks_equivalence(rng):
    """Scanned block stacks (nn.scan, params with a leading depth axis)
    compute exactly what the unrolled per-block modules compute: init the
    unrolled model, restack its per-block params into the scanned layout,
    and compare eval outputs bit-for-bit."""
    from helpers import synthetic_batch

    pt = synthetic_batch(rng, counts=(150, 90), num_points=256, depth=6)
    bb = dict(TINY_BACKBONE,
              n_enc_depths=(2, 1, 1, 2, 2), c_enc_depths=(2, 1, 2),
              n_dec_depths=(1, 1, 2, 1), c_dec_depths=(2, 1),
              shuffle_orders=False)
    model_u = build_model(dict(TINY_MODEL, backbone=dict(bb, scan_blocks=False)))
    model_s = build_model(dict(TINY_MODEL, backbone=dict(bb, scan_blocks=True)))
    vu = jax.jit(lambda r, p: model_u.init(r, p, train=False))(RNGS, pt)
    vs = jax.jit(lambda r, p: model_s.init(r, p, train=False))(RNGS, pt)

    # restack unrolled params via the library converter (the supported
    # train-unrolled -> serve-scanned checkpoint path)
    from cdsegnet_tpu.utils.params import (
        restack_block_params,
        unstack_block_params,
    )

    params_s = restack_block_params(vu["params"])
    assert jax.tree_util.tree_structure(params_s) == (
        jax.tree_util.tree_structure(vs["params"])
    )
    # round-trip back to the unrolled layout is the identity
    round_trip = unstack_block_params(params_s)
    assert jax.tree_util.tree_structure(round_trip) == (
        jax.tree_util.tree_structure(vu["params"])
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(round_trip),
        jax.tree_util.tree_leaves(vu["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    variables = {"params": params_s, "batch_stats": vu["batch_stats"]}

    noise = jax.random.normal(jax.random.PRNGKey(7), (256, 6), jnp.float32)
    out_u = jax.jit(
        lambda v, p: model_u.apply(
            v, p, noise, method=CNFSegmentor.inference,
        )["seg_logits"]
    )({"params": vu["params"], "batch_stats": vu["batch_stats"]}, pt)
    out_s = jax.jit(
        lambda v, p: model_s.apply(
            v, p, noise, method=CNFSegmentor.inference,
        )["seg_logits"]
    )(variables, pt)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_s),
                               rtol=1e-5, atol=1e-5)


def test_scan_blocks_train_grads(rng):
    """Scanned stacks train: finite loss/grads with drop-path active and
    gradient signal in every stacked depth slice."""
    from helpers import synthetic_batch

    pt = synthetic_batch(rng, counts=(150, 90), num_points=256, depth=6)
    bb = dict(TINY_BACKBONE, n_enc_depths=(2, 1, 1, 2, 2),
              c_enc_depths=(2, 1, 2), drop_path=0.2)
    model = build_model(dict(TINY_MODEL, backbone=bb))
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(RNGS, pt)
    criteria = Criteria(
        [dict(type="MSELoss"), dict(type="CrossEntropyLoss"),
         dict(type="LovaszLoss")], loss_type="GLS",
    )

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pt, train=True, rngs=RNGS, mutable=["batch_stats"],
        )
        return criteria(out, mode="train")

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))
    g = grads["backbone"]["n_enc0_blocks"]["block"]["attn"]["qkv"]["kernel"]
    assert g.shape[0] == 2  # leading depth axis
    per_depth = np.abs(np.asarray(g)).sum(axis=tuple(range(1, g.ndim)))
    assert (per_depth > 0).all()


def test_dual_fusion_parity():
    """`fuse_dual_gathers=True` computes EXACTLY the unfused dual-branch
    model: concat -> shared gather -> slice is elementwise identical to two
    per-branch gathers, and all per-branch compute is untouched. Params map
    by pure renaming (Block/<sub> -> DualBlock/{n,c}_<sub>). Covers paired
    stacks, the n-only level-4 tail (with curve-order offset), and both
    fused decoder levels. Reference runs the branches' kernels separately
    (`point_transformer_v3m1_base.py:282-289,355-365,1785-1808`)."""
    import jax.numpy as jnp

    from cdsegnet_tpu.models.ptv3 import PointTransformerV3

    arch = dict(
        c_in_channels=6, n_in_channels=6,
        c_stride=(4, 4), c_enc_depths=(2, 2, 2),
        c_enc_channels=(8, 16, 16), c_enc_num_head=(1, 2, 2),
        c_enc_patch_size=(64, 64, 64),
        c_dec_depths=(1, 1), c_dec_channels=(8, 8), c_dec_num_head=(1, 1),
        c_dec_patch_size=(64, 64),
        n_stride=(2, 2, 2, 2), n_enc_depths=(2, 1, 2, 1, 3),
        n_enc_channels=(8, 16, 16, 16, 16), n_enc_num_head=(1, 2, 2, 2, 2),
        n_enc_patch_size=(64,) * 5,
        n_dec_depths=(1, 1, 1, 1), n_dec_channels=(8, 8, 16, 16),
        n_dec_num_head=(1, 1, 2, 2), n_dec_patch_size=(64,) * 4,
        mlp_ratio=2, drop_path=0.0, proj_drop=0.0, num_classes=5, t_dim=16,
        condition=True, capacity_div=(1, 2, 4, 8, 8), scan_blocks=False,
        shuffle_orders=False,
    )
    mu = PointTransformerV3(**arch, fuse_dual_gathers=False)
    mf = PointTransformerV3(**arch, fuse_dual_gathers=True)
    rng = np.random.RandomState(0)
    pt = synthetic_batch(rng, counts=(150, 90), num_points=256, depth=6)
    t_emb = jnp.asarray(rng.randn(256, 16).astype(np.float32))
    vu = jax.jit(lambda r, n, c, t: mu.init(r, n, c, t, train=False))(
        RNGS, pt, pt, t_emb
    )

    # ---- rename-only mapping: unfused -> fused ----
    n_shifts = [0] + list(np.cumsum([(s - 1).bit_length()
                                     for s in arch["n_stride"]]))
    c_shifts = [0] + list(np.cumsum([(s - 1).bit_length()
                                     for s in arch["c_stride"]]))
    cs_of = {sh: i for i, sh in enumerate(c_shifts)}
    pf = dict(vu["params"])

    def fuse_group(npfx, cpfx, dualpfx, nd, cd):
        paired = min(nd, cd)
        for i in range(paired):
            nb, cb = pf.pop(f"{npfx}{i}"), pf.pop(f"{cpfx}{i}")
            d = {f"n_{k}": v for k, v in nb.items()}
            d.update({f"c_{k}": v for k, v in cb.items()})
            pf[f"{dualpfx}{i}"] = d
        for j, i in enumerate(range(paired, nd)):  # n tail renumbers from 0
            pf[f"{npfx}{j}"] = pf.pop(f"{npfx}{i}")
        for j, i in enumerate(range(paired, cd)):
            pf[f"{cpfx}{j}"] = pf.pop(f"{cpfx}{i}")

    for s, lvl in enumerate(n_shifts):
        cs = cs_of.get(lvl)
        if cs is not None:
            fuse_group(f"n_enc{s}_block", f"c_enc{cs}_block",
                       f"enc_dual{lvl}_block",
                       arch["n_enc_depths"][s], arch["c_enc_depths"][cs])
    for s in range(len(arch["n_enc_depths"]) - 1):
        lvl = n_shifts[s]
        cs = cs_of.get(lvl)
        if cs is not None and cs < len(arch["c_enc_depths"]) - 1:
            fuse_group(f"n_dec{s}_block", f"c_dec{cs}_block",
                       f"dec_dual{lvl}_block",
                       arch["n_dec_depths"][s], arch["c_dec_depths"][cs])

    # the fused init must produce the same tree structure as the mapping
    vf = jax.jit(lambda r, n, c, t: mf.init(r, n, c, t, train=False))(
        RNGS, pt, pt, t_emb
    )
    assert jax.tree_util.tree_structure(vf["params"]) == (
        jax.tree_util.tree_structure(
            jax.tree_util.tree_map(lambda x: x, pf)
        )
    )

    def run(m, params):
        cpt, npt = jax.jit(
            lambda v, n, c, t: m.apply(v, n, c, t, train=False)
        )({"params": params, "batch_stats": vu["batch_stats"]}, pt, pt, t_emb)
        return np.asarray(npt.feat), np.asarray(cpt.feat)

    n_u, c_u = run(mu, vu["params"])
    n_f, c_f = run(mf, pf)
    np.testing.assert_allclose(n_f, n_u, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(c_f, c_u, rtol=2e-5, atol=2e-5)


def test_adapt_backbone_params_roundtrip():
    """`adapt_backbone_params` converts a fused+unrolled train checkpoint to
    every serving layout and back losslessly, and the converted tree loads
    into the target model (structure check via init)."""
    import jax.numpy as jnp

    from cdsegnet_tpu.models.ptv3 import PointTransformerV3
    from cdsegnet_tpu.utils.params import adapt_backbone_params
    from helpers import synthetic_batch

    arch = dict(
        c_in_channels=6, n_in_channels=6,
        c_stride=(4, 4), c_enc_depths=(2, 2, 2),
        c_enc_channels=(8, 16, 16), c_enc_num_head=(1, 2, 2),
        c_enc_patch_size=(64, 64, 64),
        c_dec_depths=(1, 1), c_dec_channels=(8, 8), c_dec_num_head=(1, 1),
        c_dec_patch_size=(64, 64),
        n_stride=(2, 2, 2, 2), n_enc_depths=(2, 1, 2, 1, 3),
        n_enc_channels=(8, 16, 16, 16, 16), n_enc_num_head=(1, 2, 2, 2, 2),
        n_enc_patch_size=(64,) * 5,
        n_dec_depths=(1, 1, 1, 1), n_dec_channels=(8, 8, 16, 16),
        n_dec_num_head=(1, 1, 2, 2), n_dec_patch_size=(64,) * 4,
        mlp_ratio=2, drop_path=0.0, num_classes=5, t_dim=16,
        condition=True, capacity_div=(1, 2, 4, 8, 8), shuffle_orders=False,
    )
    rng = np.random.RandomState(0)
    pt = synthetic_batch(rng, counts=(150, 90), num_points=256, depth=6)
    t_emb = jnp.asarray(rng.randn(256, 16).astype(np.float32))

    def init(fused, scan):
        m = PointTransformerV3(**arch, fuse_dual_gathers=fused,
                               scan_blocks=scan)
        v = jax.jit(lambda r, n, c, t: m.init(r, n, c, t, train=False))(
            RNGS, pt, pt, t_emb
        )
        return m, v["params"]

    m_train, p_train = init(fused=True, scan=False)  # production train
    for fused, scan in ((False, True), (False, False), (True, True)):
        m_tgt, p_tgt = init(fused, scan)
        conv = adapt_backbone_params(p_train, m_tgt, scan=scan, fused=fused)
        assert (
            jax.tree_util.tree_structure(conv)
            == jax.tree_util.tree_structure(dict(p_tgt))
        ), (fused, scan)
        # lossless: back to the train layout is the identity
        back = adapt_backbone_params(conv, m_train, scan=False, fused=True)
        for a, b in zip(
            jax.tree_util.tree_leaves(back),
            jax.tree_util.tree_leaves(dict(p_train)),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pad_narrow_gathers_exact():
    """`pad_narrow_gathers` is a pure schedule change: zero-padding narrow
    xCPE gather rows to 64 channels (wider rows amortize per-row gather
    latency, DESIGN §14) is EXACT — padded weight rows are zero, and the
    params tree is unchanged (padding happens at apply time), so one init
    serves both models. Also pins the raw op at an odd width."""
    import jax.numpy as jnp

    from cdsegnet_tpu.models.ptv3 import PointTransformerV3
    from cdsegnet_tpu.ops.subm_conv import subm_conv_apply

    # raw op: padded == unpadded, f32 exact
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.randn(64, 12).astype(np.float32))
    nbr = jnp.asarray(rng.randint(0, 64, size=(64, 27)).astype(np.int32))
    w = jnp.asarray(rng.randn(27, 12, 16).astype(np.float32) * 0.1)
    out0 = subm_conv_apply(feat, nbr, w, pad_to=0)
    out64 = subm_conv_apply(feat, nbr, w, pad_to=64)
    np.testing.assert_array_equal(np.asarray(out64), np.asarray(out0))

    # through the model: same params, padded apply is exact
    arch = dict(
        c_in_channels=6, n_in_channels=6,
        c_stride=(4,), c_enc_depths=(1, 1), c_enc_channels=(8, 16),
        c_enc_num_head=(1, 2), c_enc_patch_size=(64, 64),
        c_dec_depths=(1,), c_dec_channels=(8,), c_dec_num_head=(1,),
        c_dec_patch_size=(64,),
        n_stride=(2, 2), n_enc_depths=(1, 1, 1),
        n_enc_channels=(8, 16, 16), n_enc_num_head=(1, 2, 2),
        n_enc_patch_size=(64,) * 3,
        n_dec_depths=(1, 1), n_dec_channels=(8, 8), n_dec_num_head=(1, 1),
        n_dec_patch_size=(64,) * 2,
        mlp_ratio=2, drop_path=0.0, proj_drop=0.0, num_classes=5, t_dim=16,
        condition=True, capacity_div=(1, 2, 4), scan_blocks=False,
        shuffle_orders=False,
    )
    m0 = PointTransformerV3(**arch, pad_narrow_gathers=0)
    mp = PointTransformerV3(**arch, pad_narrow_gathers=64)
    pt = synthetic_batch(rng, counts=(150, 90), num_points=256, depth=6)
    t_emb = jnp.asarray(rng.randn(256, 16).astype(np.float32))
    v = jax.jit(lambda r, n, c, t: m0.init(r, n, c, t, train=False))(
        RNGS, pt, pt, t_emb
    )

    def run(m):
        cpt, npt = jax.jit(
            lambda v, n, c, t: m.apply(v, n, c, t, train=False)
        )(v, pt, pt, t_emb)
        return np.asarray(npt.feat), np.asarray(cpt.feat)

    n0, c0 = run(m0)
    np_, cp = run(mp)
    np.testing.assert_allclose(np_, n0, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(cp, c0, rtol=2e-5, atol=2e-5)


def test_blocked_stem_exact_and_fallback():
    """The parity-blocked k125 stem (`stem_mode="blocked"`) equals the
    (N, 125) gather stem exactly (same params — a pure schedule choice),
    including at scene borders (tiny depth puts many points within 2 voxels
    of the grid edge, where out-of-range taps must resolve to missing).
    Under forced pooling overflow, `stem_mode="cond"` must route to the
    gather fallback and still match."""
    import jax.numpy as jnp

    from cdsegnet_tpu.models.ptv3 import PointTransformerV3

    arch = dict(
        c_in_channels=6, n_in_channels=6,
        c_stride=(4,), c_enc_depths=(1, 1), c_enc_channels=(8, 16),
        c_enc_num_head=(1, 2), c_enc_patch_size=(64, 64),
        c_dec_depths=(1,), c_dec_channels=(8,), c_dec_num_head=(1,),
        c_dec_patch_size=(64,),
        n_stride=(2, 2), n_enc_depths=(1, 1, 1),
        n_enc_channels=(8, 16, 16), n_enc_num_head=(1, 2, 2),
        n_enc_patch_size=(64,) * 3,
        n_dec_depths=(1, 1), n_dec_channels=(8, 8), n_dec_num_head=(1, 1),
        n_dec_patch_size=(64,) * 2,
        mlp_ratio=2, drop_path=0.0, proj_drop=0.0, num_classes=5, t_dim=16,
        condition=True, capacity_div=(1, 1, 1), scan_blocks=False,
        shuffle_orders=False,
    )
    rng = np.random.RandomState(3)
    # depth=4 -> 16^3 grid: scene borders well represented
    pt = synthetic_batch(rng, counts=(150, 90), num_points=256, depth=4)
    t_emb = jnp.asarray(rng.randn(256, 16).astype(np.float32))

    mg = PointTransformerV3(**arch, stem_mode="gather")
    mb = PointTransformerV3(**arch, stem_mode="blocked")
    mc = PointTransformerV3(**arch, stem_mode="cond")
    v = jax.jit(lambda r, n, c, t: mg.init(r, n, c, t, train=False))(
        RNGS, pt, pt, t_emb
    )

    # precondition: NO pooled level drops (else blocked is undefined)
    _, inter0 = mg.apply(
        v, pt, pt, t_emb, train=False, mutable=["intermediates"],
    )
    assert np.asarray(
        inter0["intermediates"]["pyramid_dropped"][0]
    ).sum() == 0

    def run(m, point):
        cpt, npt = jax.jit(
            lambda v, n, c, t: m.apply(v, n, c, t, train=False)
        )(v, point, point, t_emb)
        return np.asarray(npt.feat), np.asarray(cpt.feat)

    n_g, c_g = run(mg, pt)
    n_b, c_b = run(mb, pt)
    n_c, c_c = run(mc, pt)
    np.testing.assert_allclose(n_b, n_g, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(c_b, c_g, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(n_c, n_g, rtol=2e-2, atol=2e-2)

    # forced overflow: capacities too small for the scene -> dropped > 0 at
    # some pooled level -> the cond stem must take the gather branch (and
    # the pyramid its sorted-exact tables): cond == gather bit-for-bit
    arch_of = dict(arch, capacity_div=(1, 8, 16))
    mgo = PointTransformerV3(**arch_of, stem_mode="gather")
    mco = PointTransformerV3(**arch_of, stem_mode="cond")
    vo = jax.jit(lambda r, n, c, t: mgo.init(r, n, c, t, train=False))(
        RNGS, pt, pt, t_emb
    )
    _, inter = mgo.apply(
        vo, pt, pt, t_emb, train=False, mutable=["intermediates"],
    )
    dropped = np.asarray(
        inter["intermediates"]["pyramid_dropped"][0]
    )
    assert dropped.sum() > 0, "test setup failed to force overflow"

    def run2(m):
        cpt, npt = jax.jit(
            lambda v, n, c, t: m.apply(v, n, c, t, train=False)
        )(vo, pt, pt, t_emb)
        return np.asarray(npt.feat), np.asarray(cpt.feat)

    n_go, _ = run2(mgo)
    n_co, _ = run2(mco)
    np.testing.assert_array_equal(n_co, n_go)

    # single-branch Embedding (plain PTv3) rides the same SubMConv wiring
    arch_p = dict(arch, condition=False, t_dim=-1)
    pg = PointTransformerV3(**arch_p, stem_mode="gather")
    pb = PointTransformerV3(**arch_p, stem_mode="blocked")
    vp = jax.jit(lambda r, n: pg.init(r, n, train=False))(RNGS, pt)

    def run3(m):
        npt = jax.jit(lambda v, n: m.apply(v, n, train=False))(vp, pt)
        return np.asarray(npt.feat)

    np.testing.assert_allclose(run3(pb), run3(pg), rtol=2e-2, atol=2e-2)
