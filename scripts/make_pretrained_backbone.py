"""Produce a warm-start backbone in the reference's release format.

The reference ALWAYS trains from an ImageNet-pretrained `iabn_sync`
checkpoint (reference: networks/resnet.py:432-488, deeplab_v3.py:36-49);
with no egress here, the analogue is a JOINT pre-run on the rich synthetic
distribution at a DIFFERENT seed (different images, same visual world —
the transfer setting ImageNet plays for VOC), whose backbone is exported
into the exact `resnet101_iabn_sync.pth.tar` release layout so the warm
start exercises the FULL pretrained path: torch file → state_dict →
load_pretrained_backbone → Flax tree.

    python scripts/make_pretrained_backbone.py \
        --out /tmp/backbones/rn50_rich.pth.tar --epochs 8

Then train from it (any entry point):

    python scripts/protocol_compare.py --protocol 15-1-flagship \
        --methods ce,bacs_plus \
        --override +network.backbone_weights_path=/tmp/backbones/rn50_rich.pth.tar
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--backbone", default="resnet50")
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--n-train", type=int, default=1536)
    ap.add_argument("--n-classes", type=int, default=21)
    ap.add_argument("--seed", type=int, default=7,
                    help="MUST differ from the protocol seed (42): the "
                         "pre-run sees different images")
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    from bacs_tpu.config import load_config
    from bacs_tpu.train.loop import Trainer
    from bacs_tpu.utils.cache import enable_compilation_cache
    from bacs_tpu.utils.torch_weights import export_backbone_release

    enable_compilation_cache()
    config = load_config(
        "conf/joint_debug", "config",
        [
            "network=deep_lab",
            f"network.backbone={args.backbone}",
            f"dataset.dataset.num_classes={args.n_classes}",
            f"dataset.dataset.crop_size={args.crop}",
            f"dataset.dataset.n_train={args.n_train}",
            f"dataset.dataset.n_val={max(64, args.n_train // 8)}",
            "+dataset.dataset.style=rich",
            "+dataset.dataset.cache_decoded=device",
            f"training.epochs={args.epochs}",
            f"training.batch_size={args.batch}",
            f"training.seed={args.seed}",
            "training.debug=false",
            "optimizer.lr=0.03",
        ],
    )
    t0 = time.time()
    trainer = Trainer(config)
    miou = trainer.fit()
    variables = {
        "params": trainer.state.params,
        "batch_stats": trainer.state.batch_stats,
    }
    os.makedirs(os.path.dirname(os.path.abspath(
        os.path.expanduser(args.out))), exist_ok=True)
    n = export_backbone_release(variables, args.out)
    print(json.dumps(dict(
        out=args.out, backbone=args.backbone, joint_miou=round(float(miou), 4),
        n_tensors=n, seconds=round(time.time() - t0, 1),
    )))


if __name__ == "__main__":
    main()
