"""Timing-protocol evaluation (reference `tools/test_time.py:30-64`).

Measures single-step-inference latency under the paper's speed protocol:
no TTA, no fragmented inference (one whole-scene forward), SSI.

    python tools/test_time.py --config-file configs/scannet/cdsegnet.py \
        [--checkpoint model_best] [--synthetic]

With --synthetic no dataset is needed: a ScanNet-sized random scene is used
(same protocol as bench.py but through the full tester path).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import cdsegnet_tpu  # noqa: F401
from cdsegnet_tpu.engine.config import Config, parse_options


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--num-points", type=int, default=104448)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--options", nargs="*", default=None)
    args = ap.parse_args()
    cfg = Config.fromfile(args.config_file)
    cfg.merge_from_dict(parse_options(args.options))

    from cdsegnet_tpu.engine.state import batch_to_point
    from cdsegnet_tpu.models.builder import build_model
    from cdsegnet_tpu.models.segmentor import CNFSegmentor

    # serve-layout overrides (same policy as tools/test.py::load_state, but
    # defaulting to the timing protocol's UNROLLED serve layout — the scan
    # while-loop costs ~9 ms/step and only buys fresh-compile time, which
    # the persistent compile cache amortizes; DESIGN §14): never fused
    # (slower end-to-end in inference), narrow gathers padded, no remat.
    model_cfg = dict(cfg.model)
    if isinstance(model_cfg.get("backbone"), dict) and (
        model_cfg["backbone"].get("type", "").startswith("PT-v3")
    ):
        model_cfg["backbone"] = dict(
            model_cfg["backbone"],
            scan_blocks=bool(cfg.get("serve_scan_blocks", False)),
            fuse_dual_gathers=bool(cfg.get("serve_fuse_dual_gathers", False)),
            pad_narrow_gathers=int(cfg.get("serve_pad_narrow_gathers", 64)),
            remat_blocks=False,
        )
    model = build_model(model_cfg)
    n = args.num_points
    feat_dim = cfg.get("feat_dim", 6)
    rng = np.random.RandomState(0)
    grid = rng.randint(0, 1 << 9, size=(n, 3)).astype(np.int32)
    batch = dict(
        coord=(grid * 0.02).astype(np.float32),
        grid_coord=grid,
        feat=rng.randn(n, feat_dim).astype(np.float32),
        segment=np.zeros((n,), np.int32),
        batch=np.zeros((n,), np.int32),
        mask=np.ones((n,), bool),
    )
    point = batch_to_point(
        {k: jnp.asarray(v) for k, v in batch.items()},
        cfg.get("serialization_depth", 12), 1,
    )
    rngs = dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
                shuffle=jax.random.PRNGKey(2), diffusion=jax.random.PRNGKey(3))
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(rngs, point)
    if args.checkpoint:
        # any-layout restore + conversion to THIS serving layout (train
        # checkpoints are fused+unrolled; see tools/test.py::load_state)
        from cdsegnet_tpu.engine.checkpoint import CheckpointManager
        from cdsegnet_tpu.utils.params import adapt_backbone_params

        mgr = CheckpointManager(
            os.path.join(cfg.get("save_path", "exp/default"), "model")
        )
        raw = mgr.restore_raw(args.checkpoint)
        if raw is None:
            raise FileNotFoundError(f"checkpoint {args.checkpoint!r} not found")
        params = dict(raw["params"])
        if "backbone" in params and hasattr(model, "backbone"):
            params["backbone"] = adapt_backbone_params(
                params["backbone"], model.backbone,
                scan=model_cfg["backbone"].get("scan_blocks", False),
                fused=model_cfg["backbone"].get("fuse_dual_gathers", False),
            )
        variables = {"params": params,
                     "batch_stats": raw.get("batch_stats", {})}

    noise = jax.random.normal(jax.random.PRNGKey(7), (n, cfg.model.c_in_channels))

    @jax.jit
    def ssi(v, p, z):
        return model.apply(v, p, z, method=CNFSegmentor.inference)["seg_logits"]

    out = ssi(variables, point, noise)
    _ = float(jnp.sum(out))
    t0 = time.time()
    for _i in range(args.iters):
        out = ssi(variables, point, noise)
        _ = float(jnp.sum(out))
    dt = (time.time() - t0) / args.iters
    print(f"SSI latency: {dt * 1e3:.2f} ms/scene, "
          f"{n / dt:,.0f} points/s on {jax.devices()[0]}")


if __name__ == "__main__":
    main()
