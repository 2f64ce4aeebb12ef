"""Batch loaders: sampling, Mix3D, static-bucket collation, prefetch.

Replaces the reference's torch DataLoader + DistributedSampler stack
(`pointcept/engines/train.py:292-342`): per-device scene lists are sampled
host-side, collated into fixed-size buckets, and prefetched on a background
thread so host preprocessing overlaps device compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from cdsegnet_tpu.data.collate import collate_sharded, mix3d


class TrainLoader:
    """Epoch-based shuffled loader producing sharded static batches.

    Each batch: dict of arrays with leading axis = num_devices; each device
    bucket holds `scenes_per_device` scenes (post-Mix3D) padded to
    `num_points`.
    """

    def __init__(
        self,
        dataset,
        num_devices: int = 1,
        scenes_per_device: int = 2,
        num_points: int = 204800,
        mix_prob: float = 0.0,
        seed: int = 0,
        feat_dim: Optional[int] = None,
        drop_last: bool = True,
        prefetch: int = 2,
        pair_feat_keys: Optional[Sequence[str]] = None,
        microbatch: int = 1,
    ):
        self.dataset = dataset
        self.num_devices = num_devices
        self.scenes_per_device = scenes_per_device
        self.num_points = num_points
        self.mix_prob = mix_prob
        self.seed = seed
        self.feat_dim = feat_dim
        self.drop_last = drop_last
        self.prefetch = prefetch
        # two-view contrastive collation (MSC pretraining); Mix3D is
        # meaningless across views and is skipped
        self.pair_feat_keys = pair_feat_keys
        # gradient microbatching: each device bucket is emitted as
        # `microbatch` sub-buckets (extra leading axis after the device
        # axis), each holding scenes_per_device/microbatch scenes padded to
        # num_points/microbatch. Mix3D applies WITHIN a micro bucket (a
        # merged scene must fit its static bucket); at 1 scene per micro it
        # is a no-op — the documented fidelity tradeoff of the fast
        # unrolled-no-remat recipe (see configs/scannet/cdsegnet.py).
        assert scenes_per_device % microbatch == 0, (scenes_per_device, microbatch)
        assert num_points % microbatch == 0, (num_points, microbatch)
        self.microbatch = microbatch
        self.scenes_per_batch = num_devices * scenes_per_device

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.scenes_per_batch
        return (n + self.scenes_per_batch - 1) // self.scenes_per_batch

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        rng = np.random.default_rng(self.seed + epoch)
        return rng.permutation(len(self.dataset))

    def _make_batch(self, idxs: Sequence[int], epoch: int, step: int):
        rng = np.random.default_rng(
            (self.seed, epoch, step, 0xC0FFEE)
        )
        per_device: List[List[Dict]] = []
        for d in range(self.num_devices):
            scene_ids = idxs[
                d * self.scenes_per_device: (d + 1) * self.scenes_per_device
            ]
            scenes = [self.dataset.get(int(i), rng) for i in scene_ids]
            if self.pair_feat_keys is None and self.microbatch == 1:
                scenes = mix3d(scenes, rng, self.mix_prob)
            per_device.append(scenes)
        if self.microbatch > 1:
            return self._collate_micro(per_device, rng)
        if self.pair_feat_keys is not None:
            from cdsegnet_tpu.data.collate import collate_pair_scenes

            buckets = [
                collate_pair_scenes(
                    s, self.num_points, self.scenes_per_device,
                    self.pair_feat_keys,
                )
                for s in per_device
            ]
            import numpy as _np

            return {
                k: _np.stack([b[k] for b in buckets]) for k in buckets[0]
            }
        return collate_sharded(
            per_device, self.num_points, self.scenes_per_device, self.feat_dim
        )

    def _collate_micro(self, per_device, rng):
        """(device, micro, points) buckets for gradient accumulation."""
        from cdsegnet_tpu.data.collate import collate_scenes

        spm = self.scenes_per_device // self.microbatch
        ppm = self.num_points // self.microbatch
        dev_stacks = []
        for scenes in per_device:
            micros = []
            for m in range(self.microbatch):
                group = scenes[m * spm: (m + 1) * spm]
                group = mix3d(group, rng, self.mix_prob)
                micros.append(collate_scenes(group, ppm, spm, self.feat_dim))
            dev_stacks.append(
                {k: np.stack([mb[k] for mb in micros]) for k in micros[0]}
            )
        return {
            k: np.stack([d[k] for d in dev_stacks]) for k in dev_stacks[0]
        }

    def epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        idxs = self._epoch_indices(epoch)
        nb = len(self)
        if self.prefetch > 0:
            yield from self._prefetched(idxs, epoch, nb)
        else:
            for step in range(nb):
                lo = step * self.scenes_per_batch
                yield self._make_batch(idxs[lo: lo + self.scenes_per_batch], epoch, step)

    def _prefetched(self, idxs, epoch, nb):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for step in range(nb):
                    lo = step * self.scenes_per_batch
                    q.put(
                        self._make_batch(
                            idxs[lo: lo + self.scenes_per_batch], epoch, step
                        )
                    )
            finally:
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item


class EvalLoader:
    """Sequential whole-scene loader (one scene per batch, bucketed size)."""

    def __init__(self, dataset, num_points: int, num_scenes: int = 1,
                 feat_dim: Optional[int] = None, seed: int = 0):
        self.dataset = dataset
        self.num_points = num_points
        self.num_scenes = num_scenes
        self.feat_dim = feat_dim
        self.seed = seed

    def __len__(self):
        return len(self.dataset)

    def __iter__(self):
        from cdsegnet_tpu.data.collate import collate_scenes

        rng = np.random.default_rng(self.seed)
        for i in range(len(self.dataset)):
            scene = self.dataset.get(i, rng)
            yield collate_scenes(
                [scene], self.num_points, self.num_scenes, self.feat_dim
            ), scene


class MultiDatasetLoader:
    """Round-robin over per-dataset loaders with loop-ratio weighting
    (reference `pointcept/datasets/dataloader.py:23-112`, used for PPT joint
    training).

    Reference semantics: the epoch length is governed by the MAIN (first)
    dataset — per cycle, dataset i contributes ``ratio_i`` batches; a
    non-main dataset that exhausts restarts (with a fresh shuffle), and the
    epoch ends when the main dataset exhausts."""

    def __init__(self, loaders: Sequence[TrainLoader], ratios: Sequence[int]):
        assert len(loaders) == len(ratios)
        self.loaders = list(loaders)
        self.ratios = list(ratios)

    def __len__(self):
        # reference `dataloader.py:98-103`
        main = len(self.loaders[0])
        r0 = self.ratios[0]
        return main // r0 * sum(self.ratios) + main % r0

    def epoch(self, epoch: int):
        iters = [iter(l.epoch(epoch)) for l in self.loaders]
        restarts = [0] * len(iters)
        while True:
            for i in range(len(iters)):
                for _ in range(self.ratios[i]):
                    try:
                        batch = next(iters[i])
                    except StopIteration:
                        if i == 0:
                            return
                        restarts[i] += 1
                        iters[i] = iter(self.loaders[i].epoch(
                            (epoch + 1) * 1000 + restarts[i]
                        ))
                        batch = next(iters[i])
                    # host-side provenance tag (popped by Trainer.train to
                    # select the per-dataset/condition train step)
                    batch["_dataset_idx"] = i
                    yield batch
