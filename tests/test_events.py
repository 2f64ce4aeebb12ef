"""Observability: TensorBoard event files, PLY dumps, fallback warnings."""

import os

import numpy as np


def test_tb_event_file_roundtrip(tmp_path):
    """Our hand-rolled event files must parse with TensorBoard's own loader
    (reference TensorboardXWriter parity, `utils/events.py:293-593`)."""
    from cdsegnet_tpu.engine.events import EventStorage

    storage = EventStorage(str(tmp_path), tensorboard=True)
    storage.put_scalar("loss", 1.5)
    storage.put_scalar("lr", 0.01)
    storage.write(step=3)
    storage.put_scalar("loss", 1.25)
    storage.write(step=4)
    storage.close()

    tb_dir = tmp_path / "tb"
    files = os.listdir(tb_dir)
    assert len(files) == 1 and files[0].startswith("events.out.tfevents.")

    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader,
    )

    events = list(EventFileLoader(str(tb_dir / files[0])).Load())
    assert events[0].file_version == "brain.Event:2"
    scalars = {}
    for e in events[1:]:
        for v in e.summary.value:
            # the loader migrates simple_value into the tensor form
            val = (
                v.tensor.float_val[0]
                if v.tensor.float_val
                else v.simple_value
            )
            scalars.setdefault(v.tag, []).append((e.step, val))
    assert scalars["loss"] == [(3, 1.5), (4, 1.25)]
    assert scalars["lr"][0][1] == np.float32(0.01)


def test_ply_roundtrip(tmp_path):
    from cdsegnet_tpu.utils.visualization import (
        read_ply,
        save_segmentation,
    )

    coord = np.random.rand(64, 3).astype(np.float32)
    labels = np.random.randint(-1, 5, 64)
    path = str(tmp_path / "seg.ply")
    save_segmentation(coord, labels, path, num_classes=5)
    c2, col = read_ply(path)
    np.testing.assert_allclose(c2, coord, atol=1e-6)
    # ignored points gray, same labels share colors
    ig = labels == -1
    assert (col[ig] == 128).all()
    for lbl in range(5):
        m = labels == lbl
        if m.sum() > 1:
            assert (col[m] == col[m][0]).all()


def test_packed_argsort_fallback_warns(recwarn):

    import jax.numpy as jnp

    import cdsegnet_tpu.models.structure as st

    st._WARNED_PACKED_FALLBACK = False
    keys = jnp.arange(16, dtype=jnp.int64)
    out = st.packed_argsort(keys, key_bits=62)  # 62 + 4 > 63 -> fallback
    np.testing.assert_array_equal(np.asarray(out), np.arange(16))
    assert any("packed_argsort" in str(w.message) for w in recwarn.list)


def test_cls_evaluator_hook(tmp_path):
    """ClsEvaluator: accuracy meters over a stub val loader, allAcc exported
    as the checkpoint metric."""
    import jax
    import numpy as np

    from cdsegnet_tpu.data.collate import collate_scenes
    from cdsegnet_tpu.engine.events import EventStorage
    from cdsegnet_tpu.engine.hooks import ClsEvaluator
    from cdsegnet_tpu.models.builder import build_model
    from cdsegnet_tpu.utils.logger import get_root_logger

    model = build_model(dict(
        type="DefaultClassifier", num_classes=3,
        backbone=dict(type="SpUNet-v1m1", in_channels=6, num_classes=8,
                      base_channels=8, channels=(8, 8, 16, 16, 16, 16, 8, 8),
                      layers=(1, 1, 1, 1, 1, 1, 1, 1),
                      capacity_div=(1, 2, 4, 8, 8)),
    ))
    rng = np.random.RandomState(0)

    def shape(label):
        n = 50
        return dict(
            coord=rng.rand(n, 3).astype(np.float32),
            feat=rng.rand(n, 6).astype(np.float32),
            grid_coord=rng.randint(0, 64, (n, 3)).astype(np.int32),
            segment=np.full(n, label, np.int64),
            category=np.int64(label),
        )

    scenes = [shape(0), shape(1), shape(2)]
    loader = [(collate_scenes([s], 64, 1), s) for s in scenes]

    batch = loader[0][0]
    from cdsegnet_tpu.engine.state import batch_to_point

    pt = batch_to_point({k: jax.numpy.asarray(v) for k, v in batch.items()}, 7, 1)
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(
        dict(params=jax.random.PRNGKey(0)), pt
    )

    class StubState:
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

    class StubCfg(dict):
        def get(self, k, d=None):
            return super().get(k, d)

    class Data:
        num_classes = 3

    class Cfg:
        data = Data()

        @staticmethod
        def get(k, d=None):
            return {"serialization_depth": 7}.get(k, d)

    class StubTrainer:
        val_loader = loader
        epoch = 0
        cfg = Cfg()
        state = StubState()
        model_ = model
        comm_info = {}
        logger = get_root_logger(name="test.clseval")
        storage = EventStorage(str(tmp_path))

    StubTrainer.model = model
    hook = ClsEvaluator()
    hook.trainer = StubTrainer()
    hook.after_epoch()
    assert hook.trainer.comm_info["current_metric_name"] == "allAcc"
    v = hook.trainer.comm_info["current_metric_value"]
    assert 0.0 <= v <= 1.0
