"""Synthetic-input tests for the round-3 offline preprocessing converters
(arkitscenes / structured3d / waymo): each converter must produce archives
its dataset class loads (reference
`pointcept/datasets/preprocessing/{arkitscenes,structured3d,waymo}/`)."""

import io
import os
import struct
import sys
import zipfile

import numpy as np

from cdsegnet_tpu.data.datasets import build_dataset

TOOLS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
)
sys.path.insert(0, TOOLS)


def _write_ply_mesh(path, coord, color, faces, fmt="binary_little_endian"):
    header = [
        b"ply",
        f"format {fmt} 1.0".encode(),
        b"comment synthetic",
        f"element vertex {len(coord)}".encode(),
        b"property float x",
        b"property float y",
        b"property float z",
        b"property uchar red",
        b"property uchar green",
        b"property uchar blue",
        f"element face {len(faces)}".encode(),
        b"property list uchar int vertex_indices",
        b"end_header",
    ]
    with open(path, "wb") as f:
        f.write(b"\n".join(header) + b"\n")
        if fmt == "ascii":
            for c, col in zip(coord, color):
                f.write(
                    f"{c[0]} {c[1]} {c[2]} {col[0]} {col[1]} {col[2]}\n".encode()
                )
            for face in faces:
                f.write(("3 " + " ".join(map(str, face)) + "\n").encode())
        else:
            vtx = np.zeros(
                len(coord),
                np.dtype(
                    [("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                     ("red", "u1"), ("green", "u1"), ("blue", "u1")]
                ),
            )
            vtx["x"], vtx["y"], vtx["z"] = coord.T
            vtx["red"], vtx["green"], vtx["blue"] = color.T
            f.write(vtx.tobytes())
            for face in faces:
                f.write(struct.pack("<B3i", 3, *face))


def test_preprocess_arkitscenes(tmp_path):
    from preprocess_arkitscenes import parse_scene, read_ply_mesh, vertex_normals

    # unit square in the z=0 plane, two triangles -> normals all +/-z
    coord = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    color = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0]], np.uint8
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    nv = vertex_normals(coord.astype(np.float64), faces)
    np.testing.assert_allclose(np.abs(nv[:, 2]), 1.0, atol=1e-6)

    scene_dir = tmp_path / "raw" / "3dod" / "Training" / "sceneA"
    scene_dir.mkdir(parents=True)
    ply_path = scene_dir / "sceneA_3dod_mesh.ply"
    _write_ply_mesh(str(ply_path), coord, color, faces)

    ply = read_ply_mesh(str(ply_path))
    np.testing.assert_array_equal(ply["face_list"], faces)
    np.testing.assert_allclose(ply["vertex"]["x"], coord[:, 0])

    # ascii variant exercises the other reader branch
    _write_ply_mesh(str(scene_dir / "ascii.ply"), coord, color, faces, "ascii")
    ascii_ply = read_ply_mesh(str(scene_dir / "ascii.ply"))
    np.testing.assert_allclose(ascii_ply["vertex"]["z"], coord[:, 2])
    np.testing.assert_array_equal(ascii_ply["face_list"], faces)

    out_root = tmp_path / "out"
    parse_scene(str(ply_path), str(out_root))
    ds = build_dataset(dict(type="ArkitScenesDataset", split="Training",
                            data_root=str(out_root), transform=[]))
    assert len(ds) == 1
    data = ds.get(0)
    assert data["coord"].shape == (4, 3)
    assert data["normal"].shape == (4, 3)
    np.testing.assert_allclose(
        np.linalg.norm(data["normal"], axis=1), 1.0, atol=1e-4
    )
    assert (data["segment"] == 0).all()


def _png_bytes(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def test_preprocess_structured3d(tmp_path):
    from preprocess_structured3d import parse_scene

    h, w = 8, 16
    depth = np.full((h, w), 1000, np.uint16)  # 1 m everywhere
    rgb = np.full((h, w, 3), 128, np.uint8)
    semantic = np.full((h, w), 5, np.uint8)  # NYU id 5 -> class index 4

    zip_path = tmp_path / "scene.zip"
    room = "Structured3D/scene_00000/2D_rendering/0"
    with zipfile.ZipFile(zip_path, "w") as z:
        z.writestr(f"{room}/panorama/camera_xyz.txt", "0 0 1600")
        z.writestr(f"{room}/panorama/full/depth.png", _png_bytes(depth))
        z.writestr(f"{room}/panorama/full/rgb_rawlight.png", _png_bytes(rgb))
        z.writestr(f"{room}/panorama/full/semantic.png", _png_bytes(semantic))
        frame = f"{room}/perspective/full/0"
        z.writestr(
            f"{frame}/camera_pose.txt",
            "0 0 1600 1 0 0 0 0 1 0.5 0.5",
        )
        z.writestr(f"{frame}/depth.png", _png_bytes(depth))
        z.writestr(f"{frame}/rgb_rawlight.png", _png_bytes(rgb))
        z.writestr(f"{frame}/semantic.png", _png_bytes(semantic))

    out_root = tmp_path / "out"
    written = parse_scene("scene_00000", [str(zip_path)], str(out_root))
    assert len(written) == 1 and written[0].endswith("room_0.pth")
    assert "/train/" in written[0]  # scene id < 3000

    ds = build_dataset(dict(type="Structured3DDataset", split="train",
                            data_root=str(out_root), transform=[]))
    assert len(ds) == 1
    data = ds.get(0)
    n = data["coord"].shape[0]
    assert 0 < n <= 2 * h * w
    assert data["segment"].shape == (n,)
    assert set(np.unique(data["segment"])) == {4}  # NYU 5 -> 25-class idx 4
    # 1 m constant depth: panorama points sit exactly 1 m from the camera,
    # perspective points at depth*|ray| <= ~1.3 m (meters, not mm — the
    # unit conversion is part of the contract). Camera (0, 0, 1.6 m) up
    # after the z-up axis swap.
    center = np.array([0.0, 0.0, 1.6])
    d = np.linalg.norm(data["coord"] - center, axis=1)
    assert 0.5 < d.min() and d.max() < 1.5
    np.testing.assert_allclose(
        np.linalg.norm(data["normal"], axis=1), 1.0, atol=1e-4
    )


def test_waymo_tfrecord_reader(tmp_path):
    from preprocess_waymo import iter_tfrecord

    payloads = [b"hello", b"", b"x" * 1000]
    path = tmp_path / "seq.tfrecord"
    with open(path, "wb") as f:
        for p in payloads:
            f.write(struct.pack("<Q", len(p)) + b"\x00" * 4 + p + b"\x00" * 4)
    assert list(iter_tfrecord(str(path))) == payloads


def test_waymo_range_image_geometry():
    from preprocess_waymo import range_image_to_cartesian

    rng = np.random.default_rng(0)
    h, w = 4, 8
    ri = rng.random((h, w)) * 50 + 1
    incl = np.linspace(0.3, -0.3, h)
    xyz = range_image_to_cartesian(ri, incl, np.eye(4))
    # identity extrinsic: |xyz| == range, z == r * sin(inclination)
    np.testing.assert_allclose(np.linalg.norm(xyz, axis=-1), ri, atol=1e-9)
    np.testing.assert_allclose(xyz[..., 2], ri * np.sin(incl)[:, None], atol=1e-9)

    # translation-only extrinsic shifts every point
    ext = np.eye(4)
    ext[:3, 3] = [1.0, 2.0, 3.0]
    shifted = range_image_to_cartesian(ri, incl, ext)
    np.testing.assert_allclose(shifted - xyz, np.broadcast_to(ext[:3, 3], xyz.shape))

    # identity per-pixel pose + identity frame pose is a no-op
    pose = np.zeros((h, w, 6))
    same = range_image_to_cartesian(ri, incl, np.eye(4), pose, np.eye(4))
    np.testing.assert_allclose(same, xyz, atol=1e-9)

    # 90-degree yaw in the sensor extrinsic rotates the azimuth reference
    # (azimuth_correction): ranges are still preserved
    yaw = np.eye(4)
    yaw[:2, :2] = [[0, -1], [1, 0]]
    rot = range_image_to_cartesian(ri, incl, yaw)
    np.testing.assert_allclose(np.linalg.norm(rot, axis=-1), ri, atol=1e-9)


def test_waymo_convert_and_load(tmp_path):
    from preprocess_waymo import convert_frame_arrays, write_frame

    rng = np.random.default_rng(1)

    def laser(h, w, labeled):
        ri1 = rng.random((h, w, 2)) * 40
        ri2 = rng.random((h, w, 2)) * 40
        ri1[0, 0, 0] = 0.0  # no-return pixel must be dropped
        out = dict(
            ri=[ri1, ri2],
            inclinations=np.linspace(0.2, -0.2, h),
            extrinsic=np.eye(4),
        )
        if labeled:
            out["labels"] = [
                rng.integers(0, 23, (h, w, 2)).astype(np.int32), None
            ]
        return out

    lasers = [laser(4, 8, True), laser(2, 6, False)]
    velodyne, labels = convert_frame_arrays(lasers)
    n = 4 * 8 * 2 + 2 * 6 * 2 - 2  # one no-return pixel dropped per laser
    assert velodyne.shape == (n, 4) and velodyne.dtype == np.float32
    assert labels.shape == (n, 2) and labels.dtype == np.int32

    save = tmp_path / "training" / "seq0"
    write_frame(str(save), 0, velodyne, labels)
    ds = build_dataset(dict(type="WaymoDataset", split="training",
                            data_root=str(tmp_path), transform=[]))
    assert len(ds) == 1
    data = ds.get(0)
    assert data["coord"].shape == (n, 3)
    assert (np.abs(data["strength"]) <= 1).all()
    np.testing.assert_array_equal(data["segment"], labels[:, 1] - 1)

    # testing split: no labels written, loader falls back to ignore_index
    velodyne_t, labels_t = convert_frame_arrays(lasers, testing=True)
    assert labels_t is None
    save_t = tmp_path / "testing" / "seq1"
    write_frame(str(save_t), 0, velodyne_t, None)
    assert not os.path.exists(save_t / "labels")
    ds_t = build_dataset(dict(type="WaymoDataset", split="testing",
                              data_root=str(tmp_path), transform=[]))
    assert (ds_t.get(0)["segment"] == -1).all()
