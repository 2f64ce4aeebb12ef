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
from cdsegnet_tpu.models.structure import make_point_batch

import jax.numpy as jnp


def load_state(cfg, checkpoint: str):
    model = build_model(dict(cfg.model))
    n = cfg.get("bucket_num_points", 204800)
    feat_dim = cfg.get("feat_dim", 6)
    point = make_point_batch(
        coord=jnp.zeros((n, 3)),
        feat=jnp.zeros((n, feat_dim)),
        grid_coord=jnp.zeros((n, 3), jnp.int32),
        batch=jnp.zeros((n,), jnp.int32),
        mask=jnp.zeros((n,), bool).at[: n // 2].set(True),
        segment=jnp.zeros((n,), jnp.int32),
        depth=cfg.get("serialization_depth", 16),
        num_scenes=cfg.get("scenes_per_device", 2),
    )
    rngs = dict(params=jax.random.PRNGKey(0), dropout=jax.random.PRNGKey(1),
                shuffle=jax.random.PRNGKey(2), diffusion=jax.random.PRNGKey(3))
    variables = jax.jit(lambda r, p: model.init(r, p, train=False))(rngs, point)
    state = TrainState.create(variables, tx=_null_tx(), rng=jax.random.PRNGKey(0))
    mgr = CheckpointManager(os.path.join(cfg.get("save_path", "exp/default"), "model"))
    restored = mgr.restore(state, checkpoint)
    if restored is None:
        raise FileNotFoundError(f"checkpoint {checkpoint!r} not found")
    return model, restored


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
