"""CLI entry point, byte-compatible with the reference's Hydra surface.

    python main.py --config-path conf/bacs --config-name bacs_plus_config \
        training.batch_size=4 +training.steps_per_class=100

(reference: main.py:6-14 — Hydra-decorated `train(config)` builds
`training.Trainer` and calls `.fit()`; the SLURM env stripping of
reference main.py:17-32 is obsolete under JAX.)
"""

from __future__ import annotations

import argparse
import sys


def parse_args(argv):
    parser = argparse.ArgumentParser(description="BACS-TPU trainer")
    parser.add_argument("--config-path", default="conf/joint_debug")
    parser.add_argument("--config-name", default="config")
    parser.add_argument("overrides", nargs="*", help="key=value overrides")
    return parser.parse_args(argv)


def train(config) -> float:
    from bacs_tpu.train.loop import Trainer

    trainer = Trainer(config)
    return trainer.fit()


def main(argv=None) -> float:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    from bacs_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from bacs_tpu.config import load_config

    config = load_config(args.config_path, args.config_name, args.overrides)
    miou = train(config)
    print(f"final mIoU: {miou:.4f}")
    return miou


if __name__ == "__main__":
    main()
