"""Benchmark: CDSegNet single-step-inference (SSI) throughput on one chip.

Protocol mirrors the reference timing setup (`README.md:243-248`,
`tools/test_time.py:30-64`): no TTA, no fragmented inference, single forward
pass per scene (SSI), full CDSegNet ScanNet architecture.

Baseline derivation (see BASELINE.md): the reference reports ~22 s for the
full ScanNet val split (312 scenes, ~150k grid-sampled points/scene) on
4x4090 -> ~2.13M points/s aggregate -> ~266k points/s per accelerator of a
v5e-8 pod when matched pod-for-node. `vs_baseline` is measured points/s/chip
over that 266k figure (>1.0 = faster than the reference per-chip).

Prints ONE JSON line.
"""

import json
import jax.numpy as jnp
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from __graft_entry__ import _flagship_cfg, _synthetic_point_batch
from cdsegnet_tpu.models.builder import build_model
from cdsegnet_tpu.models.segmentor import CNFSegmentor

BASELINE_PTS_PER_SEC_PER_CHIP = 266_000.0


def main():
    import os

    num_points = int(os.environ.get("BENCH_POINTS", 104448))  # ~ScanNet scene
    patch = 1024
    cfg = _flagship_cfg(num_points, patch, scale=1)
    attn = os.environ.get("CDSEG_ATTENTION")  # "pallas" | "xla" | unset=auto
    if attn:
        cfg["backbone"]["use_pallas"] = attn == "pallas"
    model = build_model(cfg)
    point = _synthetic_point_batch(num_points, 1, depth=10, seed=0)
    n_real = int(np.asarray(point.mask).sum())

    rngs = dict(
        params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
        shuffle=jax.random.PRNGKey(2), diffusion=jax.random.PRNGKey(3),
    )
    t0 = time.time()
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(rngs, point)
    jax.block_until_ready(variables)
    init_s = time.time() - t0

    noise = jax.random.normal(jax.random.PRNGKey(7), (num_points, 6))

    @jax.jit
    def ssi(variables, point, noise):
        return model.apply(
            variables, point, noise, method=CNFSegmentor.inference,
        )["seg_logits"]

    # force full materialization with a host read — block_until_ready can
    # return early through the remote-device relay
    t0 = time.time()
    out = ssi(variables, point, noise)
    _ = float(jnp.sum(out))
    compile_s = time.time() - t0


    iters = 10
    t0 = time.time()
    for _ in range(iters):
        out = ssi(variables, point, noise)
        _ = float(jnp.sum(out))
    dt = (time.time() - t0) / iters

    pts_per_sec = n_real / dt
    print(
        json.dumps(
            dict(
                metric="ssi_points_per_sec_per_chip",
                value=round(pts_per_sec, 1),
                unit="points/s",
                vs_baseline=round(pts_per_sec / BASELINE_PTS_PER_SEC_PER_CHIP, 3),
                extra=dict(
                    step_ms=round(dt * 1e3, 2),
                    n_points=n_real,
                    init_s=round(init_s, 1),
                    compile_s=round(compile_s, 1),
                    device=str(jax.devices()[0]),
                ),
            )
        )
    )


if __name__ == "__main__":
    main()
