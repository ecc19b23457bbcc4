"""Generate a synthetic dataset in the REAL Cityscapes directory layout.

Produces what the authenticated Cityscapes download leaves on disk
(reference: dataset/cityscape_dataset.py; our loader
bacs_tpu/data/datasets.py make_cityscapes_source):
`{root}/leftImg8bit/{split}/{city}/{city}_xxxxxx_000019_leftImg8bit.png`
plus `{root}/gtFine/{split}/{city}/..._gtFine_labelIds.png` — label PNGs
carry RAW Cityscapes ids (7, 8, 11, ...) so the loader's id→trainid
remap table is genuinely exercised, and images are spread over multiple
cities so the domain-shift scenario (cities = domains) has real
domain_ids. Content comes from data/datasets.SyntheticSource
(class-correlated colors → short runs genuinely learn).

    python scripts/gen_cityscapes_layout.py --root /tmp/cs_synth \
        --cities 4 --per-city 8 --size 128

Used by tests/test_cityscapes_layout_e2e.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRAIN_CITIES = ("aachen", "bochum", "cologne", "dusseldorf", "erfurt",
                "hamburg", "hanover", "jena")
VAL_CITIES = ("frankfurt", "lindau", "munster")


def generate(
    root: str,
    cities: int = 3,
    per_city: int = 8,
    val_cities: int = 1,
    val_per_city: int = 4,
    size: int = 128,
    seed: int = 0,
) -> str:
    """Write the layout under `root`; returns `root`."""
    import numpy as np
    from PIL import Image

    from bacs_tpu.data.datasets import (
        CITYSCAPES_ID_TO_TRAINID,
        SyntheticSource,
    )

    if cities > len(TRAIN_CITIES) or val_cities > len(VAL_CITIES):
        raise ValueError(
            f"at most {len(TRAIN_CITIES)} train / {len(VAL_CITIES)} val "
            f"cities available, got {cities}/{val_cities}"
        )
    root = os.path.expanduser(root)
    # invert the loader's id→trainid map so the PNGs carry raw ids and
    # the remap path is exercised; trainid 0 (background) → id 0
    # ("unlabeled", which the loader's remap_default folds back to 0)
    trainid_to_id = np.zeros(256, np.uint8)
    for raw_id, train_id in CITYSCAPES_ID_TO_TRAINID.items():
        trainid_to_id[train_id] = raw_id

    n_classes = len(CITYSCAPES_ID_TO_TRAINID) + 1  # 19 + background

    def write_split(split, city_names, per, seed_off):
        for ci, city in enumerate(city_names):
            img_dir = os.path.join(root, "leftImg8bit", split, city)
            ann_dir = os.path.join(root, "gtFine", split, city)
            os.makedirs(img_dir, exist_ok=True)
            os.makedirs(ann_dir, exist_ok=True)
            src = SyntheticSource(per, size, n_classes,
                                  seed=seed + seed_off + ci)
            for i in range(per):
                img, lbl = src.load(i)
                stem = f"{city}_{i:06d}_000019"
                Image.fromarray(img).save(
                    os.path.join(img_dir, f"{stem}_leftImg8bit.png")
                )
                raw = trainid_to_id[np.asarray(lbl, np.uint8)]
                Image.fromarray(raw).save(
                    os.path.join(ann_dir, f"{stem}_gtFine_labelIds.png")
                )

    write_split("train", TRAIN_CITIES[:cities], per_city, seed_off=1)
    write_split("val", VAL_CITIES[:val_cities], val_per_city, seed_off=100)
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--cities", type=int, default=3)
    ap.add_argument("--per-city", type=int, default=8)
    ap.add_argument("--val-cities", type=int, default=1)
    ap.add_argument("--val-per-city", type=int, default=4)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    out = generate(args.root, args.cities, args.per_city, args.val_cities,
                   args.val_per_city, args.size, args.seed)
    print(f"wrote synthetic Cityscapes layout at {out}")


if __name__ == "__main__":
    main()
