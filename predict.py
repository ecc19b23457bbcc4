"""Inference CLI: load a trainer checkpoint and segment images.

    python predict.py --config-path conf/bacs --config-name bacs_plus_config \
        --checkpoint der_ckpt --images img1.jpg img2.jpg --out masks/

    python predict.py ... --export model.stablehlo   # serialize for serving
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(description="BACS-TPU inference")
    parser.add_argument("--config-path", default="conf/joint_debug")
    parser.add_argument("--config-name", default="config")
    parser.add_argument("--checkpoint", required=True, help="ckpt_dir of a run")
    parser.add_argument("--images", nargs="*", default=[])
    parser.add_argument("--out", default="predictions")
    parser.add_argument("--export", default=None,
                        help="write a StableHLO export to this path")
    parser.add_argument("--conf-dtype", default="float16",
                        choices=("float16", "uint8", "none"),
                        help="confidence wire format (uint8 = 1/255 "
                             "quantized on device; none = masks only)")
    parser.add_argument("--pack-masks", action="store_true",
                        help="bit-pack mask payload to ceil(log2(classes)) "
                             "bits/pixel on device (link-bound serving)")
    parser.add_argument("--n-devices", type=int, default=None,
                        help="batch-shard the forward over this many chips "
                             "(1-D data mesh; params replicated)")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])

    from bacs_tpu.config import load_config
    from bacs_tpu.serve import Predictor
    from bacs_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    config = load_config(args.config_path, args.config_name, args.overrides)
    predictor = Predictor.from_checkpoint(
        args.checkpoint, config,
        conf_dtype=args.conf_dtype, pack_masks=args.pack_masks,
        n_devices=args.n_devices,
    )
    if args.export:
        path = predictor.export(args.export)
        print(f"exported inference fn to {path}")
    if args.images:
        predictor.predict_files(args.images, out_dir=args.out)
        print(f"wrote {len(args.images)} masks to {args.out}/")


if __name__ == "__main__":
    main()
