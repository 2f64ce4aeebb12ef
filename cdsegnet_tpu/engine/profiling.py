"""Profiling hooks (reference `RuntimeProfiler`/`V2`,
`pointcept/engines/hooks/misc.py:315-464`).

TPU equivalent: `jax.profiler` traces (XPlane + TensorBoard-compatible
trace.json.gz) captured for a configurable window of training steps, plus a
programmatic summary of the heaviest fused ops extracted from the trace.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
from typing import Optional

import jax

from cdsegnet_tpu.engine.hooks import HOOKS, HookBase


def summarize_trace(trace_dir: str, top: int = 20):
    """Aggregate device op durations from the newest trace.json.gz."""
    files = sorted(
        glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    )
    if not files:
        return []
    with gzip.open(files[-1]) as f:
        data = json.load(f)
    tot = collections.Counter()
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e and not e.get("name", "$").startswith("$"):
            tot[e["name"]] += e["dur"]
    return tot.most_common(top)


@HOOKS.register_module()
class RuntimeProfiler(HookBase):
    """Capture a jax.profiler trace over steps [wait, wait + active)."""

    def __init__(self, wait: int = 2, active: int = 3, log_summary: bool = True):
        self.wait = wait
        self.active = active
        self.log_summary = log_summary
        self._running = False

    @property
    def trace_dir(self):
        return os.path.join(self.trainer.save_path, "trace")

    def before_step(self):
        step = int(self.trainer.state.step)
        if step == self.wait and not self._running:
            jax.profiler.start_trace(self.trace_dir)
            self._running = True

    def after_step(self):
        step = int(self.trainer.state.step)
        if self._running and step >= self.wait + self.active:
            jax.profiler.stop_trace()
            self._running = False
            if self.log_summary:
                for name, dur in summarize_trace(self.trace_dir):
                    self.trainer.logger.info(
                        f"[profile] {dur / 1e3:9.2f} ms {name[:90]}"
                    )

    def after_train(self):
        if self._running:
            jax.profiler.stop_trace()
            self._running = False
