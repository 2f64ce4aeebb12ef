"""Generic testing entrypoint (TTA fragment-voting evaluation).

Usage:
    python tools/test.py --config-file configs/scannet/cdsegnet.py \
        --checkpoint model_best [--options inference_mode=SSI]

Counterpart of the reference `tools/test.py` / `tools/test_CDSegNet_*.py`;
`inference_mode` selects SSI (default), MSAI or MSFI, `inference_step` the
DDIM step count, `noise_level` the robustness-protocol gaussian sigma.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import cdsegnet_tpu  # noqa: F401
from cdsegnet_tpu.engine.checkpoint import CheckpointManager
from cdsegnet_tpu.engine.config import Config, parse_options
from cdsegnet_tpu.engine.state import TrainState
from cdsegnet_tpu.engine.test import TESTERS
from cdsegnet_tpu.models.builder import build_model


def load_state(cfg, checkpoint: str):
    """Build the SERVING model and load any-layout checkpoint into it.

    Training uses the unrolled block layout (fastest step, fits HBM without
    whole-graph remat — configs/scannet/cdsegnet.py); serving uses the
    scanned layout (~10x faster fresh compile, DESIGN §11). The checkpoint
    is restored without a target tree and converted to the serving layout
    (`utils.params.convert_to_layout`), so one checkpoint serves both. The
    reference has a single torch layout (`engines/test.py:58-87` load path).
    """
    model_cfg = dict(cfg.model)
    serve_scan = bool(cfg.get("serve_scan_blocks", True))
    # serving never fuses dual gathers (measured slower end-to-end than the
    # unfused schedule — DESIGN §14); training may (2.8% faster steps)
    serve_fused = bool(cfg.get("serve_fuse_dual_gathers", False))
    # zero-pad narrow xCPE gather rows to 64 channels at serve time (exact;
    # gathers are row-latency bound under ~128 B — measured 243.5 vs
    # 247.3 ms/SSI-step end-to-end on v5e, DESIGN §14)
    serve_pad = int(cfg.get("serve_pad_narrow_gathers", 64))
    # k125 stem formulation: "cond" stays exact under pooling overflow by
    # construction (one lax.cond picks blocked vs gather per batch)
    serve_stem = str(cfg.get("serve_stem_mode", "cond"))
    is_ptv3 = isinstance(model_cfg.get("backbone"), dict) and (
        "scan_blocks" in model_cfg["backbone"]
        or model_cfg["backbone"].get("type", "").startswith("PT-v3")
    )
    if is_ptv3:
        model_cfg["backbone"] = dict(
            model_cfg["backbone"], scan_blocks=serve_scan,
            fuse_dual_gathers=serve_fused,
            pad_narrow_gathers=serve_pad,
            stem_mode=serve_stem,
            # serving never takes a backward pass; remat only slows it down
            remat_blocks=False,
        )
    model = build_model(model_cfg)
    mgr = CheckpointManager(os.path.join(cfg.get("save_path", "exp/default"), "model"))
    raw = mgr.restore_raw(checkpoint)
    if raw is None:
        raise FileNotFoundError(f"checkpoint {checkpoint!r} not found")
    from cdsegnet_tpu.utils.params import adapt_backbone_params, convert_to_layout

    params = dict(raw["params"])
    if is_ptv3 and "backbone" in params:
        params["backbone"] = adapt_backbone_params(
            params["backbone"], model.backbone, scan=serve_scan,
            fused=serve_fused,
        )
    else:
        params = convert_to_layout(
            params, "scanned" if serve_scan else "unrolled"
        )
    state = TrainState(
        step=raw.get("step", 0),
        params=params,
        batch_stats=raw.get("batch_stats", {}),
        opt_state=_null_tx().init(params),
        rng=jax.random.PRNGKey(0),
    )
    return model, state


def _null_tx():
    import optax

    return optax.identity()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--checkpoint", default="model_best")
    ap.add_argument("--options", nargs="*", default=None)
    args = ap.parse_args()
    cfg = Config.fromfile(args.config_file)
    cfg.merge_from_dict(parse_options(args.options))
    model, state = load_state(cfg, args.checkpoint)
    tester = TESTERS.build(
        dict(cfg.get("test", dict(type="SemSegTester"))),
        cfg=cfg, state=state, model=model,
    )
    tester.test()


if __name__ == "__main__":
    main()
