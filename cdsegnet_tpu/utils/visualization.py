"""Point-cloud visualization: binary PLY dumps (reference
`pointcept/utils/visualization.py`, without the plyfile/open3d deps).

`save_segmentation` colors points by class id with a deterministic palette;
`remap_to_origin` lifts grid-sampled predictions back to original-resolution
coordinates with the host-side 1-NN (csrc/hostops.cpp `knn_host`)."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _palette(num_classes: int) -> np.ndarray:
    rng = np.random.RandomState(7)
    pal = rng.randint(40, 255, (max(num_classes, 1), 3)).astype(np.uint8)
    pal[: min(num_classes, 8)] = np.array(
        [
            (174, 199, 232), (152, 223, 138), (31, 119, 180), (255, 187, 120),
            (188, 189, 34), (140, 86, 75), (255, 152, 150), (214, 39, 40),
        ][: min(num_classes, 8)],
        np.uint8,
    )
    return pal


def save_point_cloud(
    coord: np.ndarray, color: Optional[np.ndarray] = None, file_path: str = "pc.ply"
):
    """Write a binary little-endian PLY of (N, 3) coords + optional uint8
    (N, 3) colors."""
    os.makedirs(os.path.dirname(os.path.abspath(file_path)), exist_ok=True)
    coord = np.asarray(coord, np.float32)
    n = coord.shape[0]
    if color is None:
        color = np.full((n, 3), 200, np.uint8)
    color = np.asarray(color)
    if color.dtype != np.uint8:
        color = np.clip(color, 0, 255).astype(np.uint8)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
    )
    rec = np.zeros(
        n,
        dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
               ("r", "u1"), ("g", "u1"), ("b", "u1")],
    )
    rec["x"], rec["y"], rec["z"] = coord[:, 0], coord[:, 1], coord[:, 2]
    rec["r"], rec["g"], rec["b"] = color[:, 0], color[:, 1], color[:, 2]
    with open(file_path, "wb") as f:
        f.write(header.encode())
        f.write(rec.tobytes())


def save_segmentation(
    coord: np.ndarray, labels: np.ndarray, file_path: str,
    num_classes: Optional[int] = None, ignore_index: int = -1,
):
    """Color points by class id (ignored points gray)."""
    labels = np.asarray(labels).reshape(-1)
    k = num_classes or int(labels.max()) + 1
    pal = _palette(k)
    color = np.full((labels.shape[0], 3), 128, np.uint8)
    ok = labels != ignore_index
    color[ok] = pal[np.clip(labels[ok], 0, k - 1)]
    save_point_cloud(coord, color, file_path)


def read_ply(file_path: str):
    """Read back PLYs written by `save_point_cloud` (for tests)."""
    with open(file_path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        n = int(
            [ln for ln in header.decode().splitlines() if ln.startswith("element")][0]
            .split()[-1]
        )
        rec = np.frombuffer(
            f.read(),
            dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                   ("r", "u1"), ("g", "u1"), ("b", "u1")],
            count=n,
        )
    coord = np.stack([rec["x"], rec["y"], rec["z"]], -1)
    color = np.stack([rec["r"], rec["g"], rec["b"]], -1)
    return coord, color


def remap_to_origin(
    origin_coord: np.ndarray, coord: np.ndarray, labels: np.ndarray
) -> np.ndarray:
    """1-NN label lift from grid-sampled points to original resolution
    (host-side; the C `knn_host` fast path with a numpy fallback)."""
    from cdsegnet_tpu.data.native import knn_host

    idx, _ = knn_host(
        np.asarray(origin_coord, np.float32), np.asarray(coord, np.float32), 1
    )
    return np.asarray(labels)[idx[:, 0]]

