"""Instance segmentation end-to-end: InstanceParser -> PointGroup losses ->
ScanNet-protocol mAP (reference `datasets/transform.py:1106-1161`,
`engines/hooks/evaluator.py:213-589`)."""

import numpy as np
import pytest

from cdsegnet_tpu.data.transforms import TRANSFORMS
from cdsegnet_tpu.engine import insseg_eval as ie


def _toy_scene(rng, n_per=120):
    """Two instances of class 2, one of class 3, plus wall/floor points."""
    blobs = []
    seg, inst = [], []
    for i, (cls, center) in enumerate(
        [(2, (0, 0, 0)), (2, (5, 0, 0)), (3, (0, 5, 0))]
    ):
        blobs.append(rng.standard_normal((n_per, 3)).astype(np.float32) * 0.1 + center)
        seg += [cls] * n_per
        inst += [i + 7] * n_per  # arbitrary raw ids
    blobs.append(rng.standard_normal((n_per, 3)).astype(np.float32) * 0.1 + (0, 0, 5))
    seg += [0] * n_per  # wall: ignored for instances
    inst += [99] * n_per
    return dict(
        coord=np.concatenate(blobs),
        segment=np.asarray(seg, np.int64),
        instance=np.asarray(inst, np.int64),
    )


def test_instance_parser():
    rng_np = np.random.default_rng(0)
    data = _toy_scene(rng_np)
    parser = TRANSFORMS.build(dict(
        type="InstanceParser", segment_ignore_index=(-1, 0, 1)
    ))
    out = parser(dict(data), rng_np)
    inst = out["instance"]
    # ignored-class points got -1; the rest renumbered 0..2
    assert set(inst[data["segment"] == 0]) == {-1}
    assert set(inst[inst >= 0]) == {0, 1, 2}
    # centroids: every instance point carries its blob's mean
    for i in range(3):
        m = inst == i
        np.testing.assert_allclose(
            out["instance_centroid"][m][0], data["coord"][m].mean(0), atol=1e-5
        )
    # bbox: (3, 8), class column shifted past the 2 ignored classes (2 -> 0)
    assert out["bbox"].shape == (3, 8)
    assert set(out["bbox"][:, 7].astype(int)) == {0, 1}


def test_map_perfect_predictions():
    rng = np.random.default_rng(1)
    data = _toy_scene(rng)
    parser = TRANSFORMS.build(dict(type="InstanceParser"))
    data = parser(data, rng)
    inst = data["instance"]
    n = inst.shape[0]
    masks = np.stack([inst == i for i in range(3)])
    classes = np.asarray([2, 2, 3])
    scores = np.asarray([0.9, 0.8, 0.95], np.float32)
    scene = ie.associate_instances(
        masks, classes, scores, data["segment"], inst,
        num_classes=5, segment_ignore_index=(-1, 0, 1),
    )
    ap = ie.evaluate_matches([scene], valid_classes=[2, 3, 4])
    s = ie.summarize_ap(ap)
    assert s["all_ap"] == pytest.approx(1.0)
    assert s["all_ap_50"] == pytest.approx(1.0)

    # corrupt one prediction's class -> class-2 AP drops, class-3 stays
    classes_bad = np.asarray([2, 3, 3])
    scene2 = ie.associate_instances(
        masks, classes_bad, scores, data["segment"], inst,
        num_classes=5, segment_ignore_index=(-1, 0, 1),
    )
    ap2 = ie.evaluate_matches([scene2], valid_classes=[2, 3, 4])
    s2 = ie.summarize_ap(ap2)
    assert s2["all_ap"] < s["all_ap"]


def test_proposals_from_clusters():
    n = 300
    clusters = np.full(n, n, np.int64)
    clusters[:150] = 4
    clusters[150:290] = 9
    sem = np.zeros(n, np.int64)
    sem[:150] = 2
    sem[150:290] = 3
    probs = np.full((n, 5), 0.1, np.float32)
    probs[np.arange(n), sem] = 0.6
    valid = np.ones(n, bool)
    valid[290:] = False
    masks, classes, scores = ie.proposals_from_clusters(
        clusters, sem, probs, valid, min_points=100
    )
    assert masks.shape == (2, n)
    np.testing.assert_array_equal(classes, [2, 3])
    assert (scores > 0.5).all()


@pytest.mark.slow
def test_pointgroup_train_and_eval_map(tmp_path):
    """Synthetic train + InsSegEvaluator eval producing a finite mAP
    (round-1 missing #2: PointGroup could not train or be evaluated)."""
    import jax
    import optax

    from cdsegnet_tpu.data.collate import collate_scenes
    from cdsegnet_tpu.engine.state import TrainState, batch_to_point, make_train_step
    from cdsegnet_tpu.models.builder import build_model
    from cdsegnet_tpu.models.losses import build_criteria
    from test_model import RNGS, TINY_BACKBONE

    rng = np.random.default_rng(0)
    parser = TRANSFORMS.build(dict(type="InstanceParser"))
    scene = parser(_toy_scene(rng, n_per=60), rng)
    scene["feat"] = np.concatenate(
        [scene["coord"], scene["coord"]], axis=1
    ).astype(np.float32)
    scene["grid_coord"] = np.floor(scene["coord"] / 0.05).astype(np.int32)
    scene["grid_coord"] -= scene["grid_coord"].min(0)
    batch = collate_scenes([scene], 512, 1)
    assert "instance" in batch and "instance_centroid" in batch

    bb = dict(TINY_BACKBONE)
    bb["condition"] = False
    model = build_model(dict(type="PointGroup", backbone=bb, num_classes=5,
                             cluster_radius=0.5, cluster_nsample=16))
    criteria = build_criteria([
        dict(type="CrossEntropyLoss", loss_weight=1.0),
        dict(type="OffsetL1Loss", loss_weight=1.0),
        dict(type="OffsetCosineLoss", loss_weight=1.0),
    ])
    point = batch_to_point(
        {k: jax.numpy.asarray(v) for k, v in batch.items()}, 7, 1
    )
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(RNGS, point)
    tx = optax.adam(1e-3)
    state = TrainState.create(variables, tx, jax.random.PRNGKey(0))
    step = make_train_step(model, criteria, tx, 7, 1, mesh=None)
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()

    # eval through the hook machinery
    from cdsegnet_tpu.engine.config import Config
    from cdsegnet_tpu.engine.hooks import HOOKS

    class _Trainer:
        pass

    tr = _Trainer()
    tr.cfg = Config(Config._wrap(dict(
        serialization_depth=7,
        data=dict(num_classes=5, names=[f"c{i}" for i in range(5)]),
    )))
    tr.model = model
    tr.state = state
    tr.epoch = 0
    tr.comm_info = {}
    tr.val_loader = [(batch, scene)]

    import logging

    tr.logger = logging.getLogger("test_insseg")

    class _Storage:
        def put_scalar(self, *a, **k):
            pass

    tr.storage = _Storage()
    hook = HOOKS.build(dict(
        type="InsSegEvaluator", min_region_size=30, cluster_min_points=30
    ))
    hook.trainer = tr
    hook.after_epoch()
    assert "current_metric_value" in tr.comm_info
    assert np.isfinite(tr.comm_info["current_metric_value"])
