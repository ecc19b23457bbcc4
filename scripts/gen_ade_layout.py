"""Generate a synthetic dataset in the REAL ADE20K directory layout.

Produces what the MIT SceneParsing release unpacks to (reference:
dataset/ade20k.py; our loader bacs_tpu/data/datasets.py make_ade_source):
`{root}/ADEChallengeData2016/{images,annotations}/{training,validation}`
with JPEG images and single-channel label PNGs. Content comes from
data/datasets.SyntheticSource at the full 151-class space by default
(`--num-classes` can shrink it); e2e runtime is bounded by the image
COUNT/size knobs, not the class count.

    python scripts/gen_ade_layout.py --root /tmp/ade_synth --n-train 32

Used by tests/test_ade_layout_e2e.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def generate(
    root: str,
    n_train: int = 32,
    n_val: int = 8,
    size: int = 96,
    num_classes: int = 151,
    seed: int = 0,
) -> str:
    """Write the layout under `root`; returns the ADEChallengeData2016 dir."""
    from PIL import Image

    from bacs_tpu.data.datasets import SyntheticSource

    base = os.path.join(os.path.expanduser(root), "ADEChallengeData2016")

    def write_split(sub, n, seed_off):
        img_dir = os.path.join(base, "images", sub)
        ann_dir = os.path.join(base, "annotations", sub)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(ann_dir, exist_ok=True)
        src = SyntheticSource(n, size, num_classes, seed=seed + seed_off)
        for i in range(n):
            img, lbl = src.load(i)
            stem = f"ADE_{sub[:5]}_{i:08d}"
            Image.fromarray(img).save(
                os.path.join(img_dir, f"{stem}.jpg"), quality=92
            )
            Image.fromarray(lbl).save(os.path.join(ann_dir, f"{stem}.png"))

    write_split("training", n_train, seed_off=1)
    write_split("validation", n_val, seed_off=2)
    return base


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--n-train", type=int, default=32)
    ap.add_argument("--n-val", type=int, default=8)
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--num-classes", type=int, default=151)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    out = generate(args.root, args.n_train, args.n_val, args.size,
                   args.num_classes, args.seed)
    print(f"wrote synthetic ADE20K layout at {out}")


if __name__ == "__main__":
    main()
