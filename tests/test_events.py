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
