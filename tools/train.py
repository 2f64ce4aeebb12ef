"""Generic training entrypoint.

Usage:
    python tools/train.py --config-file configs/scannet/cdsegnet.py \
        [--options save_path=exp/scannet seed=...]

Counterpart of the reference `tools/train.py` + `engines/launch.py`; no
process spawning is needed — one controller drives all local TPU devices via
the mesh.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cdsegnet_tpu  # noqa: F401
from cdsegnet_tpu.engine.config import Config, parse_options
from cdsegnet_tpu.engine.train import TRAINERS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--options", nargs="*", default=None, help="key=value overrides")
    args = ap.parse_args()
    cfg = Config.fromfile(args.config_file)
    cfg.merge_from_dict(parse_options(args.options))
    os.makedirs(cfg.get("save_path", "exp/default"), exist_ok=True)
    cfg.dump(os.path.join(cfg.get("save_path", "exp/default"), "config.py"))
    trainer = TRAINERS.build(dict(cfg.get("train", dict(type="DefaultTrainer"))), cfg=cfg)
    trainer.train()


if __name__ == "__main__":
    main()
