"""Testers: TTA fragment-voting semantic-segmentation evaluation.

Reference `pointcept/engines/test.py:34-591`: per scene, every TTA
augmentation is grid-sampled into fragments; each fragment gets one SSI
forward (or a DDIM loop for MSAI/MSFI); softmax votes accumulate into the
full-resolution prediction; mIoU is computed against full-res labels and
benchmark submission files are written.

TPU adaptations: fragments are padded into a small set of static buckets so
each bucket size compiles once; votes accumulate host-side in numpy.

Multi-chip testing: the reference distributes scenes across DDP ranks via
a DistributedSampler and gathers per-scene records
(`pointcept/engines/test.py:91-94,372-414`). The single-controller TPU
equivalent is FRAGMENT-parallel inference over the device mesh: fragments
stream (in scene order) into per-bucket groups of `num_devices`, each group
runs one shard_mapped SSI forward (one fragment per chip over ICI), and the
controller scatters the resulting probabilities back into each scene's
full-resolution vote buffer. Per-fragment numerics (noise keys, padding)
are identical to the single-device path, so per-scene records match.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from cdsegnet_tpu.data.collate import collate_scenes, pick_bucket
from cdsegnet_tpu.data.datasets import build_dataset
from cdsegnet_tpu.engine.state import _shard_map, batch_to_point
from cdsegnet_tpu.models.builder import build_model
from cdsegnet_tpu.models.segmentor import CNFSegmentor, PlainSegmentor
from cdsegnet_tpu.parallel.mesh import DATA_AXIS, make_mesh
from cdsegnet_tpu.utils.logger import get_root_logger
from cdsegnet_tpu.utils.misc import intersection_and_union
from cdsegnet_tpu.utils.registry import Registry

TESTERS = Registry("testers")

DEFAULT_BUCKETS = tuple(1024 * (1 << i) for i in range(4, 11))  # 16k..1M


def make_sharded_infer_fn(model, depth: int, mesh, model_kwargs=None):
    """Fragment-parallel forward: one fragment per device over ``mesh``.

    Takes stacked ``(D, ...)`` batch/noise/rng arrays, returns ``(D, n, K)``
    logits. Each shard runs exactly the single-device program (geometry
    pyramid + SSI forward, or the generic eval forward), so outputs are
    device-wise identical to sequential inference.
    """
    model_kwargs = model_kwargs or {}
    is_cnf = isinstance(model, CNFSegmentor)
    has_geom = hasattr(getattr(model, "backbone", None), "precompute_geometry")

    def one(variables, batch, noise, rng):
        point = batch_to_point(batch, depth, 1)
        if is_cnf:
            if has_geom:
                geometry = model.backbone.precompute_geometry(point)
                return model.apply(
                    variables, point, noise, geometry,
                    method=CNFSegmentor.inference,
                )["seg_logits"]
            return model.apply(
                variables, point, noise, method=CNFSegmentor.inference
            )["seg_logits"]
        out = model.apply(
            variables, point, train=False, rngs=dict(diffusion=rng),
            **model_kwargs,
        )
        if not isinstance(out, dict):
            return out.feat
        return out.get("seg_logits", out["n_pred"])

    def sharded(variables, batch, noise, rng):
        local = jax.tree_util.tree_map(lambda x: x[0], batch)
        return one(variables, local, noise[0], rng[0])[None]

    f = _shard_map(
        sharded, mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
    )
    return jax.jit(f)


@TESTERS.register_module("SemSegTester")
class SemSegTester:
    def __init__(self, cfg, state=None, model=None, verbose: bool = True):
        self.cfg = cfg
        self.logger = get_root_logger(name="cdsegnet_tpu.test")
        self.verbose = verbose
        self.model = model if model is not None else build_model(dict(cfg.model))
        self.state = state
        self.depth = cfg.get("serialization_depth", 16)
        self.buckets = tuple(cfg.get("test_buckets", DEFAULT_BUCKETS))
        self.inference_mode = cfg.get("inference_mode", "SSI")
        self.inference_step = cfg.get("inference_step", 1)
        self.noise_level = cfg.get("noise_level", None)
        self.save_path = cfg.get("save_path", "exp/default")
        self._jit_cache: Dict[int, callable] = {}
        self._sharded = None
        self._ddim_step = None
        self._geom = None
        self._ddim_trace_count = 0  # observability: one trace per bucket shape
        # fragment-parallel inference over the local mesh (SSI only; DDIM
        # loops stay sequential). cfg.num_devices=1 forces single-device.
        nd = cfg.get("num_devices") or jax.local_device_count()
        self.mesh = make_mesh(nd) if nd > 1 else None

    def _ddim_step_fn(self):
        """One persistent jitted DDIM step, shape-specialized per bucket by
        jax.jit's own cache — never re-jitted per fragment (round-1 weak #5:
        a fresh `jax.jit(lambda ...)` per call recompiled every fragment)."""
        if self._ddim_step is None:
            model = self.model

            def step(v, p, cf, t, g):
                self._ddim_trace_count += 1  # runs only when tracing
                return model.apply(
                    v, p, cf, t, g, method=CNFSegmentor.denoise_step
                )

            self._ddim_step = jax.jit(step)
        return self._ddim_step

    def _geom_fn(self):
        """Persistent jitted pyramid precompute (pure function of the point
        geometry) — shared across SSI and every DDIM step of a fragment."""
        if self._geom is None:
            backbone = self.model.backbone
            self._geom = jax.jit(
                lambda p: backbone.precompute_geometry(p)
            )
        return self._geom

    # -- jitted per-bucket SSI forward ------------------------------------
    def _infer_fn(self, n: int):
        if n in self._jit_cache:
            return self._jit_cache[n]
        model = self.model

        model_kwargs = dict(self.cfg.get("model_kwargs", {}) or {})

        if isinstance(model, CNFSegmentor) and hasattr(
            model.backbone, "precompute_geometry"
        ):
            # split executables: the geometry pyramid compiles separately
            # from the model compute and is reused by the DDIM paths
            geom_fn = self._geom_fn()
            point_fn = jax.jit(lambda b: batch_to_point(b, self.depth, 1))

            @jax.jit
            def cnf_fn(variables, point, noise, geometry):
                return model.apply(
                    variables, point, noise, geometry,
                    method=CNFSegmentor.inference,
                )["seg_logits"]

            def fn_split(variables, batch, noise, rng):
                point = point_fn(batch)
                return cnf_fn(variables, point, noise, geom_fn(point))

            self._jit_cache[n] = fn_split
            return fn_split

        @jax.jit
        def fn(variables, batch, noise, rng):
            point = batch_to_point(batch, self.depth, 1)
            if isinstance(model, CNFSegmentor):
                return model.apply(
                    variables, point, noise, method=CNFSegmentor.inference
                )["seg_logits"]
            # everything else (PlainSegmentor, zoo wrappers, CAC, PPT with a
            # static `condition` via cfg.model_kwargs) evaluates through the
            # plain forward; rngs covers wrappers that draw
            # make_rng("diffusion") in eval (e.g. PPT-v1m1 with dm=True) —
            # unused rngs are harmless in flax. Dict outputs expose
            # n_pred/seg_logits.
            out = model.apply(
                variables, point, train=False,
                rngs=dict(diffusion=rng), **model_kwargs,
            )
            if not isinstance(out, dict):
                return out.feat
            return out.get("seg_logits", out["n_pred"])

        self._jit_cache[n] = fn
        return fn

    def _variables(self):
        return {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
        }

    def _prepare_fragment(self, frag: Dict, rng: jax.Array):
        """Collate one fragment + draw its noise (identical numerics on the
        sequential and the fragment-parallel paths)."""
        n_frag = frag["coord"].shape[0]
        bucket = pick_bucket(n_frag, self.buckets)
        batch = collate_scenes([frag], bucket, 1)
        if self.noise_level is not None:
            # robustness protocol: gaussian-perturbed features
            noise_rng, rng = jax.random.split(rng)
            batch["feat"] = batch["feat"] + self.noise_level * np.asarray(
                jax.random.normal(noise_rng, batch["feat"].shape)
            )
        c_in = getattr(self.model, "c_in_channels", batch["feat"].shape[-1])
        noise = np.asarray(jax.random.normal(rng, (bucket, c_in), jnp.float32))
        return bucket, n_frag, batch, noise, rng

    def _sharded_fn(self):
        if self._sharded is None:
            self._sharded = make_sharded_infer_fn(
                self.model, self.depth, self.mesh,
                dict(self.cfg.get("model_kwargs", {}) or {}),
            )
        return self._sharded

    def predict_fragment(self, frag: Dict, rng: jax.Array) -> np.ndarray:
        """Softmax probabilities for one fragment (n_frag, num_classes)."""
        bucket, n_frag, batch, noise, rng = self._prepare_fragment(frag, rng)
        if self.inference_mode == "SSI":
            logits = self._infer_fn(bucket)(
                self._variables(), batch, noise, rng
            )
        else:  # MSAI / MSFI via DDIM loop
            from cdsegnet_tpu.models.segmentor import inference_ddim

            point = batch_to_point(
                jax.tree_util.tree_map(jnp.asarray, batch), self.depth, 1
            )
            geometry = (
                self._geom_fn()(point)
                if hasattr(self.model.backbone, "precompute_geometry")
                else None
            )
            logits = inference_ddim(
                self.model, self._variables(), point, rng,
                step=self.inference_step,
                mode="avg" if self.inference_mode == "MSAI" else "final",
                jit_step=self._ddim_step_fn(),
                geometry=geometry,
            )
        probs = jax.nn.softmax(np.asarray(logits)[:n_frag], axis=-1)
        return np.asarray(probs)

    def _finalize_scene(self, ds, name: str, pred: np.ndarray,
                        segment: np.ndarray):
        """Meters + per-scene record + log + submission for one finished
        scene (reference `test.py:278-299,372-414`; records are gathered on
        the single controller by construction — no gloo gather needed)."""
        cfg = self.cfg
        i, u, t = intersection_and_union(
            pred, segment, cfg.data.num_classes, cfg.get("ignore_index", -1)
        )
        self._inter_sum += i
        self._union_sum += u
        self._target_sum += t
        self.records[name] = dict(intersection=i, union=u, target=t)
        self._scene_done += 1
        if self.verbose:
            miou_scene = float(np.mean(i / np.maximum(u, 1)))
            self.logger.info(
                f"Test [{self._scene_done}/{self._scene_total}] {name}: "
                f"scene mIoU {miou_scene:.4f}"
            )
        if cfg.get("submission", False):
            self.write_submission(ds, name, pred)

    def _flush_group(self, entries: List[Dict], scenes_acc: Dict, ds,
                     save_dir: str):
        """Run one fragment-per-device shard_mapped forward over a group.

        Short groups are padded by repeating the last fragment (its padded
        outputs are discarded)."""
        d = int(self.mesh.devices.size)
        all_e = entries + [entries[-1]] * (d - len(entries))
        batch = {
            k: np.stack([e["batch"][k] for e in all_e])
            for k in all_e[0]["batch"]
        }
        noise = np.stack([e["noise"] for e in all_e])
        rngs = np.stack([np.asarray(e["rng"]) for e in all_e])
        logits = np.asarray(
            self._sharded_fn()(self._variables(), batch, noise, rngs)
        )
        for i, e in enumerate(entries):
            probs = np.asarray(
                jax.nn.softmax(logits[i][: e["n_frag"]].astype(np.float32),
                               axis=-1)
            )
            acc = scenes_acc[e["name"]]
            acc["votes"][e["index"]] += probs
            acc["remaining"] -= 1
            if acc["remaining"] == 0:
                pred = acc["votes"].argmax(-1)
                np.save(os.path.join(save_dir, f"{e['name']}_pred.npy"), pred)
                self._finalize_scene(ds, e["name"], pred, acc["segment"])
                del scenes_acc[e["name"]]

    def test(self) -> Optional[float]:
        cfg = self.cfg
        ds = build_dataset(dict(cfg.data.test))
        num_classes = cfg.data.num_classes
        save_dir = os.path.join(self.save_path, "result")
        os.makedirs(save_dir, exist_ok=True)
        self._inter_sum = np.zeros(num_classes)
        self._union_sum = np.zeros(num_classes)
        self._target_sum = np.zeros(num_classes)
        self._scene_done = 0
        self._scene_total = len(ds)
        rng = jax.random.PRNGKey(cfg.get("seed", 0))
        np_rng = np.random.default_rng(cfg.get("seed", 0))
        self.records = {}
        grouped = self.mesh is not None and self.inference_mode == "SSI"
        pending: Dict[int, List[Dict]] = {}
        scenes_acc: Dict[str, Dict] = {}
        for idx in range(len(ds)):
            scene = ds.get(idx, np_rng)
            name = scene["name"]
            segment = scene["segment"]
            cache = os.path.join(save_dir, f"{name}_pred.npy")
            if os.path.isfile(cache):
                self._finalize_scene(ds, name, np.load(cache), segment)
                continue
            if not grouped:
                votes = np.zeros((segment.size, num_classes), np.float32)
                for frag in scene["fragment_list"]:
                    rng, sub = jax.random.split(rng)
                    votes[frag["index"]] += self.predict_fragment(frag, sub)
                pred = votes.argmax(-1)
                np.save(cache, pred)
                self._finalize_scene(ds, name, pred, segment)
                continue
            # fragment-parallel: enqueue this scene's fragments; groups
            # flush as they fill (scenes stream through in order)
            scenes_acc[name] = dict(
                votes=np.zeros((segment.size, num_classes), np.float32),
                remaining=len(scene["fragment_list"]),
                segment=segment,
            )
            for frag in scene["fragment_list"]:
                rng, sub = jax.random.split(rng)
                bucket, n_frag, batch, noise, sub = self._prepare_fragment(
                    frag, sub
                )
                pending.setdefault(bucket, []).append(dict(
                    name=name, n_frag=n_frag, index=frag["index"],
                    batch=batch, noise=noise, rng=sub,
                ))
                if len(pending[bucket]) == int(self.mesh.devices.size):
                    self._flush_group(
                        pending.pop(bucket), scenes_acc, ds, save_dir
                    )
        for bucket in sorted(pending):
            self._flush_group(pending.pop(bucket), scenes_acc, ds, save_dir)
        assert not scenes_acc, f"unfinished scenes: {list(scenes_acc)}"
        inter_sum, union_sum, target_sum = (
            self._inter_sum, self._union_sum, self._target_sum
        )
        iou = inter_sum / np.maximum(union_sum, 1)
        acc = inter_sum / np.maximum(target_sum, 1)
        miou = float(iou.mean())
        names = cfg.data.get("names", [str(i) for i in range(num_classes)])
        for n, v in zip(names, iou):
            self.logger.info(f"Class {n}: iou {v:.4f}")
        self.logger.info(
            f"Test result: mIoU {miou:.4f} mAcc {float(acc.mean()):.4f} "
            f"allAcc {inter_sum.sum() / max(target_sum.sum(), 1):.4f}"
        )
        return miou

    def write_submission(self, ds, name: str, pred: np.ndarray):
        """Benchmark submission files (reference `test.py:329-370`).

        - ScanNet / ScanNet200: per-scene txt of raw class ids
          (`class2id[pred]`).
        - SemanticKITTI: ``sequences/<seq>/predictions/<frame>.label`` uint32
          files of `learning_map_inv`-remapped raw labels.
        - nuScenes: ``lidarseg/test/<token>_lidarseg.bin`` uint8 files of
          ``pred + 1`` (the lidarseg challenge's 1-based label space).
        """
        sub_dir = os.path.join(self.save_path, "submit")
        dataset_type = self.cfg.data.test.get("type", "")
        if dataset_type in ("ScanNetDataset", "ScanNet200Dataset"):
            os.makedirs(sub_dir, exist_ok=True)
            np.savetxt(
                os.path.join(sub_dir, f"{name}.txt"),
                ds.class2id[pred].reshape(-1, 1), fmt="%d",
            )
        elif dataset_type == "SemanticKITTIDataset":
            seq_name, frame_name = name.split("_")
            pred_dir = os.path.join(sub_dir, "sequences", seq_name, "predictions")
            os.makedirs(pred_dir, exist_ok=True)
            lut_keys = np.array(list(ds.learning_map_inv.keys()), np.int64)
            lut = np.zeros(int(lut_keys.max()) + 1, np.uint32)
            for k, v in ds.learning_map_inv.items():
                if k >= 0:
                    lut[k] = v
            lut[np.clip(pred, 0, len(lut) - 1)].astype(np.uint32).tofile(
                os.path.join(pred_dir, f"{frame_name}.label")
            )
        elif dataset_type == "NuScenesDataset":
            out_dir = os.path.join(sub_dir, "lidarseg", "test")
            os.makedirs(out_dir, exist_ok=True)
            (pred + 1).astype(np.uint8).tofile(
                os.path.join(out_dir, f"{name}_lidarseg.bin")
            )


@TESTERS.register_module("ClsTester")
class ClsTester:
    """Shape-classification tester (reference `test.py:420-480`): one forward
    per shape through `DefaultClassifier`, overall + per-class accuracy."""

    def __init__(self, cfg, state=None, model=None, verbose: bool = True):
        self.cfg = cfg
        self.logger = get_root_logger(name="cdsegnet_tpu.test")
        self.model = model if model is not None else build_model(dict(cfg.model))
        self.state = state
        self.depth = cfg.get("serialization_depth", 12)
        self.buckets = tuple(cfg.get("test_buckets", DEFAULT_BUCKETS))
        self._jit_cache: Dict[int, callable] = {}

    def _infer_fn(self, n: int):
        if n in self._jit_cache:
            return self._jit_cache[n]
        model = self.model

        @jax.jit
        def fn(variables, batch):
            point = batch_to_point(batch, self.depth, 1)
            return model.apply(variables, point, train=False)["cls_pred"]

        self._jit_cache[n] = fn
        return fn

    def test(self) -> float:
        cfg = self.cfg
        ds = build_dataset(dict(cfg.data.test))
        num_classes = cfg.data.num_classes
        correct = np.zeros(num_classes)
        total = np.zeros(num_classes)
        rng = np.random.default_rng(cfg.get("seed", 0))
        variables = {"params": self.state.params,
                     "batch_stats": self.state.batch_stats}
        for idx in range(len(ds)):
            shape = ds.get(idx, rng)
            label = int(np.asarray(shape.get("category", shape["segment"][0])))
            n = shape["coord"].shape[0]
            bucket = pick_bucket(n, self.buckets)
            batch = collate_scenes([shape], bucket, 1)
            logits = np.asarray(self._infer_fn(bucket)(variables, batch))[0]
            pred = int(logits.argmax())
            total[label] += 1
            correct[label] += int(pred == label)
        acc = correct.sum() / max(total.sum(), 1)
        macc = float(np.mean(correct[total > 0] / total[total > 0]))
        self.logger.info(f"Cls result: allAcc {acc:.4f} mAcc {macc:.4f}")
        return float(acc)


@TESTERS.register_module("PartSegTester")
class PartSegTester(SemSegTester):
    """Part-segmentation tester (reference `test.py:483-591`): fragment vote
    accumulation like SemSeg, then **category-constrained part IoU** — each
    shape's IoU is averaged over only the part labels of its category
    (``dataset.category2part``), with the reference's both-empty-parts = 1.0
    rule; reports instance mIoU (per-shape average) and category mIoU
    (per-category average of per-shape means)."""

    def test(self) -> Optional[float]:
        cfg = self.cfg
        ds = build_dataset(dict(cfg.data.test))
        categories = list(getattr(ds, "categories", []))
        category2part = dict(getattr(ds, "category2part", {}))
        if not categories:
            # no category table configured: degenerate to plain SemSeg
            return super().test()
        n_cat = len(categories)
        iou_category = np.zeros(n_cat)
        iou_count = np.zeros(n_cat)
        rng = jax.random.PRNGKey(cfg.get("seed", 0))
        np_rng = np.random.default_rng(cfg.get("seed", 0))
        num_classes = cfg.data.num_classes
        for idx in range(len(ds)):
            scene = ds.get(idx, np_rng)
            segment = scene["segment"]
            votes = np.zeros((segment.size, num_classes), np.float32)
            for frag in scene["fragment_list"]:
                rng, sub = jax.random.split(rng)
                votes[frag["index"]] += self.predict_fragment(frag, sub)
            pred = votes.argmax(-1)
            cat_idx = int(scene["category"])
            parts = category2part[categories[cat_idx]]
            parts_iou = np.zeros(len(parts))
            for j, part in enumerate(parts):
                gt = segment == part
                pd = pred == part
                if not gt.any() and not pd.any():
                    parts_iou[j] = 1.0
                else:
                    parts_iou[j] = (gt & pd).sum() / max((gt | pd).sum(), 1)
            iou_category[cat_idx] += parts_iou.mean()
            iou_count[cat_idx] += 1
            if self.verbose:
                self.logger.info(
                    f"Test [{idx + 1}/{len(ds)}] {scene['name']} "
                    f"({categories[cat_idx]}): shape IoU {parts_iou.mean():.4f}"
                )
        ins_miou = iou_category.sum() / max(iou_count.sum(), 1e-10)
        cat_miou = float(np.mean(iou_category / np.maximum(iou_count, 1e-10)))
        for i, name in enumerate(categories):
            self.logger.info(
                f"Category {name}: iou {iou_category[i] / max(iou_count[i], 1e-10):.4f} "
                f"({int(iou_count[i])} shapes)"
            )
        self.logger.info(
            f"PartSeg result: ins.mIoU {ins_miou:.4f} cat.mIoU {cat_miou:.4f}"
        )
        return float(ins_miou)
