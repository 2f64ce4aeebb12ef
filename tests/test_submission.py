"""Submission-writer formats vs hand-built expectations
(reference `pointcept/engines/test.py:329-370`)."""

import os
from types import SimpleNamespace

import numpy as np

from cdsegnet_tpu.data.datasets import (
    ScanNet200Dataset,
    ScanNetDataset,
    SemanticKITTIDataset,
    VALID_CLASS_IDS_200,
)
from cdsegnet_tpu.engine.config import Config
from cdsegnet_tpu.engine.test import SemSegTester


def _tester(tmp_path, dataset_type):
    t = SemSegTester.__new__(SemSegTester)
    t.save_path = str(tmp_path)
    t.cfg = Config(Config._wrap(dict(data=dict(test=dict(type=dataset_type)))))
    return t


def test_scannet_submission(tmp_path):
    t = _tester(tmp_path, "ScanNetDataset")
    pred = np.array([0, 1, 19, 5])
    t.write_submission(ScanNetDataset, "scene0000_00", pred)
    out = np.loadtxt(os.path.join(tmp_path, "submit", "scene0000_00.txt"))
    np.testing.assert_array_equal(out, [1, 2, 39, 6])  # VALID_CLASS_IDS_20


def test_scannet200_submission(tmp_path):
    t = _tester(tmp_path, "ScanNet200Dataset")
    pred = np.array([0, 199, 17])
    t.write_submission(ScanNet200Dataset, "scene0001_00", pred)
    out = np.loadtxt(os.path.join(tmp_path, "submit", "scene0001_00.txt"))
    np.testing.assert_array_equal(
        out, [VALID_CLASS_IDS_200[0], VALID_CLASS_IDS_200[199], VALID_CLASS_IDS_200[17]]
    )
    assert VALID_CLASS_IDS_200[199] == 1191 and len(VALID_CLASS_IDS_200) == 200


def test_semantickitti_submission(tmp_path):
    t = _tester(tmp_path, "SemanticKITTIDataset")
    ds = SimpleNamespace(
        learning_map_inv=SemanticKITTIDataset.get_learning_map_inv(-1)
    )
    pred = np.array([0, 8, 18, 5])
    t.write_submission(ds, "08_000123", pred)
    path = os.path.join(
        tmp_path, "submit", "sequences", "08", "predictions", "000123.label"
    )
    out = np.fromfile(path, dtype=np.uint32)
    # learned ids remapped to raw semantic-kitti labels
    np.testing.assert_array_equal(out, [10, 40, 81, 30])


def test_nuscenes_submission(tmp_path):
    t = _tester(tmp_path, "NuScenesDataset")
    pred = np.array([0, 15, 7])
    t.write_submission(SimpleNamespace(), "tok123", pred)
    path = os.path.join(
        tmp_path, "submit", "lidarseg", "test", "tok123_lidarseg.bin"
    )
    out = np.fromfile(path, dtype=np.uint8)
    np.testing.assert_array_equal(out, [1, 16, 8])  # pred + 1
