"""Hook system + default hooks.

Reference: `pointcept/engines/hooks/{default,builder,misc,evaluator}.py`.
The default stack (configured by `configs/_base_/default_runtime.py:24-31`):
CheckpointLoader, IterationTimer, InformationWriter, SemSegEvaluator,
CheckpointSaver, PreciseEvaluator.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import numpy as np

from cdsegnet_tpu.utils.misc import AverageMeter, intersection_and_union_jnp
from cdsegnet_tpu.utils.registry import Registry

HOOKS = Registry("hooks")


class HookBase:
    trainer = None  # bound by the trainer

    def before_train(self):
        pass

    def before_epoch(self):
        pass

    def before_step(self):
        pass

    def after_step(self):
        pass

    def after_epoch(self):
        pass

    def after_train(self):
        pass


def build_hooks(cfgs) -> list:
    # profiling hooks live in their own module (they import this one);
    # imported here so their HOOKS registrations exist before lookup
    import cdsegnet_tpu.engine.profiling  # noqa: F401

    return [HOOKS.build(dict(c)) for c in (cfgs or [])]


@HOOKS.register_module()
class CheckpointLoader(HookBase):
    """Resume full train state from `model_last` if present
    (reference `hooks/misc.py:207-249`)."""

    def __init__(self, keywords="", replacement=None):
        self.keywords = keywords
        self.replacement = replacement

    def before_train(self):
        tr = self.trainer
        if tr.cfg.get("resume", False) and tr.ckpt_manager.has("model_last"):
            restored = tr.ckpt_manager.restore(tr.state, "model_last")
            if restored is not None:
                tr.state = restored
                tr.start_epoch = int(tr.state.step) // max(tr.steps_per_epoch, 1)
                tr.logger.info(
                    f"Resumed from checkpoint at step {int(tr.state.step)} "
                    f"(epoch {tr.start_epoch})"
                )
        elif tr.cfg.get("weight"):
            restored = tr.ckpt_manager.restore(tr.state, tr.cfg.weight)
            if restored is not None:
                tr.state = tr.state.replace(params=restored.params,
                                            batch_stats=restored.batch_stats)
                tr.logger.info(f"Loaded weights from {tr.cfg.weight}")


@HOOKS.register_module()
class IterationTimer(HookBase):
    """Wall-clock data/batch timing + ETA (reference `hooks/misc.py:32-75`)."""

    def __init__(self, warmup_iter: int = 2):
        self.warmup = warmup_iter
        self.data_m = AverageMeter()
        self.batch_m = AverageMeter()

    def before_epoch(self):
        self._t = time.perf_counter()

    def before_step(self):
        self.data_m.update(time.perf_counter() - self._t)

    def after_step(self):
        now = time.perf_counter()
        self.batch_m.update(now - self._t)
        self._t = now
        tr = self.trainer
        remain = tr.total_steps - int(tr.state.step)
        tr.comm_info["iter_info"] = (
            f"data {self.data_m.val:.3f}s batch {self.batch_m.val:.3f}s "
            f"eta {self.batch_m.avg * remain / 3600:.1f}h"
        )


@HOOKS.register_module()
class InformationWriter(HookBase):
    """Per-iteration log line + metric file (reference `hooks/misc.py:78-143`)."""

    def __init__(self, log_interval: int = 10):
        self.log_interval = log_interval

    def after_step(self):
        tr = self.trainer
        step = int(tr.state.step)
        metrics = tr.comm_info.get("metrics", {})
        for k, v in metrics.items():
            tr.storage.put_scalar(k, float(v))
        if step % self.log_interval == 0:
            loss = float(metrics.get("loss", float("nan")))
            msg = (
                f"Train [{tr.epoch + 1}/{tr.max_epoch}]"
                f"[{tr.step_in_epoch + 1}/{tr.steps_per_epoch}] "
                f"loss {loss:.4f} " + tr.comm_info.get("iter_info", "")
            )
            tr.logger.info(msg)
            tr.storage.write(step)


@HOOKS.register_module()
class SemSegEvaluator(HookBase):
    """Validation mIoU after each epoch (reference
    `hooks/evaluator.py:106-209`). Runs jitted SSI inference over the val
    loader and reduces intersection/union meters (device-side histograms;
    cross-device reduction is a psum when a mesh is active)."""

    def __init__(self, interval: int = 1):
        self.interval = interval

    def after_epoch(self):
        tr = self.trainer
        if tr.val_loader is None or (tr.epoch + 1) % self.interval != 0:
            return
        num_classes = tr.cfg.data.num_classes
        inter_sum = np.zeros(num_classes)
        union_sum = np.zeros(num_classes)
        target_sum = np.zeros(num_classes)
        rng = jax.random.PRNGKey(tr.cfg.get("seed", 0) + tr.epoch)
        for batch, scene in tr.val_loader:
            rng, sub = jax.random.split(rng)
            out = tr.eval_step(tr.state, batch, sub)
            pred = np.asarray(out["seg_logits"]).argmax(-1)
            seg = batch["segment"]
            valid = batch["mask"]
            if "origin_coord" in scene:
                # map grid-sampled predictions back to original points via
                # 1-NN (reference `hooks/evaluator.py:132-141`)
                from cdsegnet_tpu.ops.pointops import knn_remap_labels

                n_real = int(valid.sum())
                pred = np.asarray(
                    knn_remap_labels(
                        jax.numpy.asarray(scene["origin_coord"]),
                        jax.numpy.asarray(batch["coord"][:n_real]),
                        jax.numpy.asarray(pred[:n_real]),
                    )
                )
                seg = np.asarray(scene["origin_segment"]).reshape(-1)
                valid = np.ones_like(seg, bool)
            i, u, t = intersection_and_union_jnp(
                jax.numpy.asarray(pred), jax.numpy.asarray(seg), num_classes,
                jax.numpy.asarray(valid),
            )
            inter_sum += np.asarray(i)
            union_sum += np.asarray(u)
            target_sum += np.asarray(t)
        iou = inter_sum / np.maximum(union_sum, 1)
        acc = inter_sum / np.maximum(target_sum, 1)
        miou = float(iou.mean())
        names = tr.cfg.data.get("names", [str(i) for i in range(num_classes)])
        for n, v_iou, v_acc in zip(names, iou, acc):
            tr.logger.info(f"Class {n}: iou {v_iou:.4f} acc {v_acc:.4f}")
        tr.logger.info(
            f"Val result: mIoU {miou:.4f} mAcc {float(acc.mean()):.4f} "
            f"allAcc {inter_sum.sum() / max(target_sum.sum(), 1):.4f}"
        )
        tr.comm_info["current_metric_value"] = miou
        tr.comm_info["current_metric_name"] = "mIoU"
        tr.storage.put_scalar("val/mIoU", miou)


@HOOKS.register_module()
class InsSegEvaluator(HookBase):
    """Instance-segmentation validation: PointGroup clustering -> proposal
    masks -> ScanNet-protocol mAP@[.5:.95] / AP50 / AP25 (reference
    `hooks/evaluator.py:213-589`; metric math in `engine/insseg_eval.py`)."""

    def __init__(self, interval: int = 1, segment_ignore_index=(-1, 0, 1),
                 instance_ignore_index: int = -1, min_region_size: int = 100,
                 cluster_min_points: int = 100):
        self.interval = interval
        self.segment_ignore_index = tuple(segment_ignore_index)
        self.instance_ignore_index = instance_ignore_index
        self.min_region_size = min_region_size
        self.cluster_min_points = cluster_min_points
        self._jit = None

    def _step_fn(self, tr):
        if self._jit is not None:
            return self._jit
        model = tr.model
        depth = tr.cfg.get("serialization_depth", 16)
        from cdsegnet_tpu.engine.state import batch_to_point

        @jax.jit
        def fn(state, batch):
            point = batch_to_point(batch, depth, 1)
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            out = model.apply(variables, point, train=False)
            sem = out["n_pred"].argmax(-1)
            clusters = model.apply(
                variables, point, sem, out["offset_pred"],
                method=type(model).cluster,
            )
            return out["n_pred"], clusters, point.mask

        self._jit = fn
        return fn

    def after_epoch(self):
        tr = self.trainer
        if tr.val_loader is None or (tr.epoch + 1) % self.interval != 0:
            return
        from cdsegnet_tpu.engine import insseg_eval as ie

        num_classes = tr.cfg.data.num_classes
        valid_classes = [
            c for c in range(num_classes) if c not in self.segment_ignore_index
        ]
        step = self._step_fn(tr)
        scenes = []
        for batch, _scene in tr.val_loader:
            if "instance" not in batch:
                tr.logger.warning(
                    "InsSegEvaluator: batch has no instance targets; skipping"
                )
                return
            logits, clusters, mask = step(tr.state, batch)
            logits = np.asarray(logits)
            probs = np.exp(logits - logits.max(-1, keepdims=True))
            probs /= probs.sum(-1, keepdims=True)
            sem_pred = logits.argmax(-1)
            masks, classes, scores = ie.proposals_from_clusters(
                np.asarray(clusters), sem_pred, probs, np.asarray(mask),
                min_points=self.cluster_min_points,
            )
            scenes.append(
                ie.associate_instances(
                    masks, classes, scores,
                    np.where(np.asarray(mask), batch["segment"], -1),
                    np.where(np.asarray(mask), batch["instance"], -1),
                    num_classes, self.segment_ignore_index,
                    self.min_region_size,
                )
            )
        ap = ie.evaluate_matches(
            scenes, valid_classes, min_region_size=self.min_region_size
        )
        s = ie.summarize_ap(ap)
        names = tr.cfg.data.get("names", [str(i) for i in range(num_classes)])
        for li, c in enumerate(valid_classes):
            tr.logger.info(f"Class {names[c]}: AP {s['per_class_ap'][li]:.4f}")
        tr.logger.info(
            f"Val result: mAP {s['all_ap']:.4f} AP50 {s['all_ap_50']:.4f} "
            f"AP25 {s['all_ap_25']:.4f}"
        )
        tr.comm_info["current_metric_value"] = s["all_ap_50"]
        tr.comm_info["current_metric_name"] = "AP50"
        tr.storage.put_scalar("val/mAP", s["all_ap"])
        tr.storage.put_scalar("val/AP50", s["all_ap_50"])


@HOOKS.register_module()
class ClsEvaluator(HookBase):
    """Shape-classification validation after each epoch (reference
    `hooks/evaluator.py::ClsEvaluator`): per-category intersection/union
    histograms from `cls_pred` argmax, logging mIoU/mAcc/allAcc and
    exporting ``allAcc`` as the checkpoint-selection metric."""

    def __init__(self, interval: int = 1):
        self.interval = interval
        self._jit_fns = {}  # per-bucket, cached across epochs

    def after_epoch(self):
        tr = self.trainer
        if tr.val_loader is None or (tr.epoch + 1) % self.interval != 0:
            return
        num_classes = tr.cfg.data.num_classes
        # reference `intersectionAndUnion` histogram accounting
        # (`pointcept/utils/misc.py:38-52`): union = pred + target − inter
        inter = np.zeros(num_classes)
        pred_hist = np.zeros(num_classes)
        target = np.zeros(num_classes)
        variables = {"params": tr.state.params,
                     "batch_stats": tr.state.batch_stats}
        model = tr.model
        depth = tr.cfg.get("serialization_depth", 16)
        from cdsegnet_tpu.engine.state import batch_to_point

        for batch, scene in tr.val_loader:
            n = batch["coord"].shape[0]
            if n not in self._jit_fns:
                self._jit_fns[n] = jax.jit(
                    lambda v, b: model.apply(
                        v, batch_to_point(b, depth, 1), train=False
                    )["cls_pred"]
                )
            pred = int(
                np.asarray(self._jit_fns[n](variables, batch)).argmax(-1)[0]
            )
            label = int(np.asarray(scene.get("category", scene["segment"][0])))
            if 0 <= label < num_classes:
                target[label] += 1
                pred_hist[pred] += 1
                if pred == label:
                    inter[label] += 1
        union = pred_hist + target - inter
        iou = inter / np.maximum(union, 1)
        acc = inter / np.maximum(target, 1)
        all_acc = inter.sum() / max(target.sum(), 1)
        tr.logger.info(
            f"Val result: mIoU {iou.mean():.4f} mAcc {acc.mean():.4f} "
            f"allAcc {all_acc:.4f}"
        )
        tr.comm_info["current_metric_value"] = float(all_acc)
        tr.comm_info["current_metric_name"] = "allAcc"
        tr.storage.put_scalar("val/allAcc", float(all_acc))


@HOOKS.register_module()
class CheckpointSaver(HookBase):
    """Save last/best/periodic checkpoints (reference `hooks/misc.py:146-204`)."""

    def __init__(self, save_freq: Optional[int] = None):
        self.save_freq = save_freq

    def before_train(self):
        self.best = -float("inf")

    def after_epoch(self):
        tr = self.trainer
        metric = tr.comm_info.get("current_metric_value")
        is_best = metric is not None and metric > self.best
        if is_best:
            self.best = metric
            tr.logger.info(f"New best {tr.comm_info.get('current_metric_name')}: {metric:.4f}")
        thresh = tr.cfg.get("save_freq_threshold")
        snapshot = bool(
            self.save_freq and (tr.epoch + 1) % self.save_freq == 0
            and (thresh is None or tr.epoch + 1 >= thresh)
        )
        tr.ckpt_manager.save_epoch(tr.state, tr.epoch + 1, is_best, snapshot)


@HOOKS.register_module()
class PreciseEvaluator(HookBase):
    """Run the full TTA tester after training (reference `hooks/misc.py:252-278`)."""

    def __init__(self, test_last: bool = False):
        self.test_last = test_last

    def after_train(self):
        tr = self.trainer
        if tr.cfg.get("test") is None:
            return
        from cdsegnet_tpu.engine.test import SemSegTester

        name = "model_last" if self.test_last else "model_best"
        if tr.ckpt_manager.has(name):
            tr.state = tr.ckpt_manager.restore(tr.state, name) or tr.state
        tester = SemSegTester(tr.cfg, state=tr.state, model=tr.model)
        tester.test()
