"""Checkpoint save/load (reference `pointcept/engines/hooks/misc.py:146-249`).

Orbax-backed: atomic directory writes replace the reference's `.tmp` +
`os.replace` protocol; a full `TrainState` (params, batch_stats, optimizer,
step, rng) round-trips for exact resume, plus `model_best` tracking and
periodic `epoch_N` snapshots (the README's post-epoch-70 stability protocol:
cheap frequent snapshots + deterministic resume, reference
`train.py:187-191`).
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, ckpt_dir: str, keep_last: int = 3):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.keep_last = keep_last
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.ckpt_dir, name)

    def save(self, state: Any, name: str = "model_last", overwrite: bool = True):
        path = self._path(name)
        if overwrite and os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, state)
        self._ckptr.wait_until_finished()

    def save_epoch(self, state: Any, epoch: int, is_best: bool,
                   save_snapshot: bool = False):
        self.save(state, "model_last")
        if is_best:
            self.save(state, "model_best")
        if save_snapshot:
            self.save(state, f"epoch_{epoch}")
            self._gc_snapshots()

    def _gc_snapshots(self):
        snaps = sorted(
            (d for d in os.listdir(self.ckpt_dir) if d.startswith("epoch_")),
            key=lambda d: int(d.split("_")[1]),
        )
        for d in snaps[: -self.keep_last] if self.keep_last > 0 else []:
            shutil.rmtree(self._path(d), ignore_errors=True)

    def restore(self, target: Any, name: str = "model_last") -> Optional[Any]:
        path = self._path(name)
        if not os.path.exists(path):
            return None
        restored = self._ckptr.restore(path, target)
        return restored

    def restore_raw(self, name: str = "model_last") -> Optional[Any]:
        """Restore without a target tree (structure inferred from disk).

        Used by serving paths that convert the parameter layout after
        loading (unrolled train checkpoint -> scanned serving layout via
        `utils.params.restack_block_params`) and therefore cannot provide
        a matching target up front."""
        path = self._path(name)
        if not os.path.exists(path):
            return None
        return self._ckptr.restore(path)

    def has(self, name: str = "model_last") -> bool:
        return os.path.exists(self._path(name))
