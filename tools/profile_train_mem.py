"""Peak-HBM attribution for the flagship train-step executable.

Round-3 verdict item #4: the 104k-point train bucket fit v5e HBM without
remat in round 2 but OOMs at round-3 HEAD. This tool compiles the train
step (without running it) for a matrix of variants and prints XLA's
`memory_analysis()` — argument/output/alias/temp sizes — so the regression
can be attributed instead of guessed at.

Usage: python tools/profile_train_mem.py [num_points] [variant ...]
Variants: base (no remat), remat (full recompute), dots (remat with
dots_saveable policy), noscan (no nn.scan), e.g.
    python tools/profile_train_mem.py 104448 base remat dots
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from __graft_entry__ import _flagship_cfg, _synthetic_point_batch
from cdsegnet_tpu.engine.optimizer import build_optimizer
from cdsegnet_tpu.engine.state import TrainState, make_train_step
from cdsegnet_tpu.models.builder import build_model
from cdsegnet_tpu.models.losses import build_criteria

GB = 1 << 30


def analyze(num_points, remat, policy, scan):
    cfg = _flagship_cfg(num_points, 1024, scale=1)
    cfg["backbone"] = dict(
        cfg["backbone"], remat_blocks=remat, remat_policy=policy,
        scan_blocks=scan,
    )
    model = build_model(cfg)
    criteria = build_criteria(cfg["criteria"], loss_type="GLS", task_num=2)
    point = _synthetic_point_batch(num_points, 2, depth=10, seed=1)
    rngs = dict(
        params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
        shuffle=jax.random.PRNGKey(2), diffusion=jax.random.PRNGKey(3),
    )
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(rngs, point)
    tx = build_optimizer(
        dict(type="AdamW", lr=2e-3, weight_decay=0.05),
        variables["params"],
        scheduler_cfg=dict(type="OneCycleLR", pct_start=0.5,
                           div_factor=10.0, final_div_factor=1000.0),
        total_steps=1000,
        param_dicts=[dict(keyword="block", lr=2e-4)],
    )
    state = TrainState.create(variables, tx, jax.random.PRNGKey(0))
    step_fn = make_train_step(model, criteria, tx, 10, 2, mesh=None)
    batch = dict(
        coord=point.coord, grid_coord=point.grid_coord, feat=point.feat,
        segment=point.segment, batch=point.batch, mask=point.mask,
    )
    t0 = time.time()
    compiled = step_fn.lower(state, batch).compile()
    dt = time.time() - t0
    ma = compiled.memory_analysis()
    return dict(
        compile_s=round(dt, 1),
        arg_gb=round(ma.argument_size_in_bytes / GB, 3),
        out_gb=round(ma.output_size_in_bytes / GB, 3),
        alias_gb=round(ma.alias_size_in_bytes / GB, 3),
        temp_gb=round(ma.temp_size_in_bytes / GB, 3),
        peak_est_gb=round(
            (ma.argument_size_in_bytes + ma.output_size_in_bytes
             + ma.temp_size_in_bytes - ma.alias_size_in_bytes) / GB, 3),
    )


VARIANTS = dict(
    base=dict(remat=False, policy=None, scan=True),
    remat=dict(remat=True, policy=None, scan=True),
    dots=dict(remat=True, policy="dots_saveable", scan=True),
    noscan=dict(remat=False, policy=None, scan=False),
)

if __name__ == "__main__":
    args = sys.argv[1:]
    num_points = int(args[0]) if args and args[0].isdigit() else 104448
    names = [a for a in args if a in VARIANTS] or ["base", "remat", "dots"]
    print(f"device={jax.devices()[0]} num_points={num_points}")
    for name in names:
        try:
            r = analyze(num_points, **VARIANTS[name])
            print(f"{name}: {r}", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
