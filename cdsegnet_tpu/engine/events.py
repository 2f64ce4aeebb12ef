"""Scalar metric storage (reference `pointcept/utils/events.py:293-593`).

`EventStorage` keeps smoothed scalar histories; writers emit JSON lines
(a tensorboard-free equivalent of the reference's TB writer — traces and
scalars land in the experiment dir as `metrics.jsonl`).
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict, deque
from typing import Dict, Optional


class HistoryBuffer:
    def __init__(self, window: int = 20):
        self._window = deque(maxlen=window)
        self._total = 0.0
        self._count = 0
        self.latest = 0.0

    def update(self, value: float):
        value = float(value)
        self._window.append(value)
        self._total += value
        self._count += 1
        self.latest = value

    def median(self) -> float:
        s = sorted(self._window)
        return s[len(s) // 2] if s else 0.0

    def avg(self) -> float:
        return sum(self._window) / max(len(self._window), 1)

    def global_avg(self) -> float:
        return self._total / max(self._count, 1)


class EventStorage:
    def __init__(self, output_dir: Optional[str] = None):
        self.histories: Dict[str, HistoryBuffer] = defaultdict(HistoryBuffer)
        self.step = 0
        self._file = None
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            self._file = open(os.path.join(output_dir, "metrics.jsonl"), "a")

    def put_scalar(self, name: str, value: float):
        self.histories[name].update(value)

    def put_scalars(self, **kwargs):
        for k, v in kwargs.items():
            self.put_scalar(k, v)

    def write(self, step: Optional[int] = None):
        if self._file is None:
            return
        rec = {"step": step if step is not None else self.step,
               "time": time.time()}
        rec.update({k: h.latest for k, h in self.histories.items()})
        self._file.write(json.dumps(rec) + "\n")
        self._file.flush()

    def close(self):
        if self._file:
            self._file.close()
