"""Loader tests on synthetic files for the round-2 dataset additions
(waymo / structure3d / arkitscenes / scannet_pair / shapenet_part) and the
offline preprocessing scripts (s3dis, nuscenes info)."""

import json
import os
import pickle
import sys

import numpy as np
import pytest

from cdsegnet_tpu.data.datasets import build_dataset

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
sys.path.insert(0, TOOLS)


def test_waymo(tmp_path):
    seq = tmp_path / "training" / "seq0" / "velodyne"
    seq.mkdir(parents=True)
    rng = np.random.default_rng(0)
    scan = rng.random((100, 4)).astype(np.float32)
    scan.tofile(seq / "000000.bin")
    labels = np.zeros((100, 2), np.int32)
    labels[:, 1] = rng.integers(0, 23, 100)
    (tmp_path / "training" / "seq0" / "labels").mkdir()
    labels.tofile(tmp_path / "training" / "seq0" / "labels" / "000000.label")
    ds = build_dataset(dict(type="WaymoDataset", split="training",
                            data_root=str(tmp_path), transform=[]))
    assert len(ds) == 1
    data = ds.get(0)
    assert data["coord"].shape == (100, 3)
    assert (np.abs(data["strength"]) <= 1).all()  # tanh squashed
    np.testing.assert_array_equal(data["segment"], labels[:, 1] - 1)
    assert ds.get_data_name(0) == "seq0_000000"


def test_structured3d(tmp_path):
    import torch

    room = tmp_path / "train" / "scene_00000"
    room.mkdir(parents=True)
    torch.save(
        dict(coord=np.random.rand(50, 3).astype(np.float32),
             color=np.random.rand(50, 3).astype(np.float32),
             semantic_gt=np.random.randint(0, 25, 50)),
        room / "room_0.pth",
    )
    ds = build_dataset(dict(type="Structured3DDataset", split="train",
                            data_root=str(tmp_path), transform=[]))
    assert len(ds) == 1
    assert ds.get(0)["coord"].shape == (50, 3)
    assert ds.get_data_name(0) == "scene_00000_room_0"


def test_arkitscenes(tmp_path):
    import torch

    d = tmp_path / "Training"
    d.mkdir()
    torch.save(
        dict(coord=np.random.rand(40, 3).astype(np.float32),
             color=np.random.rand(40, 3).astype(np.float32),
             normal=np.random.rand(40, 3).astype(np.float32)),
        d / "scene1.pth",
    )
    ds = build_dataset(dict(type="ArkitScenesDataset", split="Training",
                            data_root=str(tmp_path), transform=[]))
    data = ds.get(0)
    assert (data["segment"] == 0).all()  # unlabeled
    assert ds.class2id[0] == 1 and len(ds.class2id) == 200


def test_scannet_pair(tmp_path):
    import torch

    scene = tmp_path / "scene0000_00" / "pcd"
    scene.mkdir(parents=True)
    for i in range(2):
        torch.save(
            dict(coord=np.random.rand(30, 3).astype(np.float32),
                 color=np.random.rand(30, 3).astype(np.float32)),
            scene / f"{i}.pth",
        )
    with open(scene / "overlap.txt", "w") as f:
        f.write(f"/scene0000_00/pcd/0.pth /scene0000_00/pcd/1.pth 0.8\n")
        f.write(f"/scene0000_00/pcd/0.pth /scene0000_00/pcd/1.pth 0.1\n")
    ds = build_dataset(dict(
        type="ScanNetPairDataset", data_root=str(tmp_path),
        overlap_threshold=0.3,
        view1_transform=[dict(type="RandomFlip", p=1)],
        view2_transform=[],
    ))
    assert len(ds) == 1  # the 0.1-overlap pair is filtered
    out = ds.get(0, np.random.default_rng(0))
    assert "view1_coord" in out and "view2_coord" in out
    assert out["view1_coord"].shape == (30, 3)


def test_shapenet_part(tmp_path):
    synset = "02691156"
    d = tmp_path / synset
    d.mkdir()
    rng = np.random.default_rng(0)
    pts = np.concatenate(
        [rng.random((20, 3)), rng.random((20, 3)), rng.integers(0, 4, (20, 1))],
        axis=1,
    )
    np.savetxt(d / "shape0.txt", pts)
    with open(tmp_path / "synsetoffset2category.txt", "w") as f:
        f.write(f"Airplane\t{synset}\n")
    split_dir = tmp_path / "train_test_split"
    split_dir.mkdir()
    with open(split_dir / "shuffled_test_file_list.json", "w") as f:
        json.dump([f"shape_data/{synset}/shape0"], f)
    ds = build_dataset(dict(type="ShapeNetPartDataset", split="test",
                            data_root=str(tmp_path), transform=[]))
    assert len(ds) == 1
    data = ds.get(0)
    assert data["coord"].shape == (20, 3)
    assert int(data["category"]) == 0
    assert ds.categories == ["Airplane"]
    assert ds.category2part["Airplane"] == [0, 1, 2, 3]


def test_preprocess_s3dis(tmp_path):
    from preprocess_s3dis import parse_room

    ann = tmp_path / "Area_1" / "office_1" / "Annotations"
    ann.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i, cls in enumerate(["chair", "stairs"]):  # stairs -> clutter
        np.savetxt(ann / f"{cls}_{i}.txt",
                   np.concatenate([rng.random((10, 3)), rng.random((10, 3)) * 255], 1))
    out = tmp_path / "out" / "Area_1" / "office_1.pth"
    assert parse_room(str(ann.parent), str(out))
    ds = build_dataset(dict(type="S3DISDataset", split="Area_1",
                            data_root=str(tmp_path / "out"), transform=[]))
    data = ds.get(0)
    assert data["coord"].shape == (20, 3)
    assert set(data["segment"]) == {8, 12}  # chair=8, clutter=12
    assert "instance" in data


def test_preprocess_nuscenes_info(tmp_path):
    from preprocess_nuscenes import build_infos

    meta = tmp_path / "v1.0-trainval"
    meta.mkdir(parents=True)
    scene = dict(token="sc1", name="scene-0001")
    sample = dict(token="sa1", scene_token="sc1")
    sd = dict(
        token="sd1", sample_token="sa1", is_key_frame=True,
        filename="samples/LIDAR_TOP/f1.pcd.bin", timestamp=123,
    )
    lseg = dict(sample_data_token="sd1", filename="lidarseg/v1.0-trainval/sd1.bin")
    for name, rows in (("scene", [scene]), ("sample", [sample]),
                       ("sample_data", [sd]), ("lidarseg", [lseg])):
        with open(meta / f"{name}.json", "w") as f:
            json.dump(rows, f)
    infos = build_infos(str(tmp_path))
    assert "scene-0001" in infos
    info = infos["scene-0001"][0]
    assert info["lidar_token"] == "sd1"
    assert info["gt_segment_path"] == "lidarseg/v1.0-trainval/sd1.bin"

    # round-trip through NuScenesDataset on synthetic binary payloads
    root = tmp_path / "ds"
    (root / "info").mkdir(parents=True)
    with open(root / "info" / "nuscenes_infos_10sweeps_val.pkl", "wb") as f:
        pickle.dump([info], f)
    raw = root / "raw"
    (raw / "samples" / "LIDAR_TOP").mkdir(parents=True)
    (raw / "lidarseg" / "v1.0-trainval").mkdir(parents=True)
    pts = np.random.rand(60, 5).astype(np.float32)
    pts.tofile(raw / "samples" / "LIDAR_TOP" / "f1.pcd.bin")
    np.random.randint(0, 32, 60, dtype=np.uint8).astype(np.uint8).tofile(
        raw / "lidarseg" / "v1.0-trainval" / "sd1.bin"
    )
    ds = build_dataset(dict(type="NuScenesDataset", split="val",
                            data_root=str(root), transform=[]))
    data = ds.get(0)
    assert data["coord"].shape == (60, 3)
    assert data["segment"].min() >= -1 and data["segment"].max() < 16
