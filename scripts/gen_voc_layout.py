"""Generate a synthetic dataset in the REAL VOC2012-aug directory layout.

Produces exactly what the reference's downloader leaves on disk
(reference: dataset/voc.py:92-147): `VOCdevkit/VOC2012/{JPEGImages,
SegmentationClass,SegmentationClassAug,ImageSets/Segmentation}` with real
JPEG images, palette-PNG masks, and `train_aug.txt`/`val.txt` list files —
so the production `conf/joint`/`conf/bacs` trees (FolderSource + native
batch decoder + fused device transforms) can run end-to-end without
network egress.  Content comes from data/datasets.SyntheticSource, so
training genuinely learns (class-correlated colors).

    python scripts/gen_voc_layout.py --root /tmp/voc_synth --n-train 64 \
        --n-val 16 --size 320

Used by scripts/bench_input.py and tests/test_voc_layout_e2e.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def voc_palette() -> list[int]:
    """The VOC label palette, flattened for PIL putpalette (the one
    bit-twiddle colormap lives in bacs_tpu.viz.media.voc_colormap)."""
    from bacs_tpu.viz.media import voc_colormap

    return voc_colormap().flatten().tolist()


def generate(
    root: str,
    n_train: int = 64,
    n_val: int = 16,
    size: int = 320,
    num_classes: int = 21,
    seed: int = 0,
    vary_sizes: bool = True,
) -> str:
    """Write the layout under `root`; returns the VOC2012 directory."""
    import numpy as np
    from PIL import Image

    from bacs_tpu.data.datasets import SyntheticSource

    voc = os.path.join(os.path.expanduser(root), "VOCdevkit", "VOC2012")
    jpeg = os.path.join(voc, "JPEGImages")
    seg = os.path.join(voc, "SegmentationClass")
    seg_aug = os.path.join(voc, "SegmentationClassAug")
    sets = os.path.join(voc, "ImageSets", "Segmentation")
    for d in (jpeg, seg, seg_aug, sets):
        os.makedirs(d, exist_ok=True)

    pal = voc_palette()
    rng = np.random.RandomState(seed)
    src_train = SyntheticSource(n_train, size, num_classes, seed=seed + 1)
    src_val = SyntheticSource(n_val, size, num_classes, seed=seed + 2)

    def write(src, i, name, mask_dirs):
        img, lbl = src.load(i)
        if vary_sizes:
            # real VOC images vary (~500x375); exercise the decode-time
            # aspect-preserving resize + center crop
            w = int(rng.randint(size, int(size * 1.6)))
            h = int(rng.randint(size, int(size * 1.6)))
            im = Image.fromarray(img).resize((w, h), Image.BILINEAR)
            lb = Image.fromarray(lbl).resize((w, h), Image.NEAREST)
        else:
            im, lb = Image.fromarray(img), Image.fromarray(lbl)
        im.save(os.path.join(jpeg, f"{name}.jpg"), quality=92)
        lb = lb.convert("P")
        lb.putpalette(pal)
        for d in mask_dirs:
            lb.save(os.path.join(d, f"{name}.png"))
        return name

    train_names = [
        write(src_train, i, f"synth_tr_{i:05d}", [seg_aug])
        for i in range(n_train)
    ]
    val_names = [
        write(src_val, i, f"synth_va_{i:05d}", [seg, seg_aug])
        for i in range(n_val)
    ]
    with open(os.path.join(sets, "train_aug.txt"), "w") as f:
        f.write("\n".join(train_names) + "\n")
    with open(os.path.join(sets, "val.txt"), "w") as f:
        f.write("\n".join(val_names) + "\n")
    with open(os.path.join(sets, "train.txt"), "w") as f:
        f.write("\n".join(train_names) + "\n")
    return voc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--n-train", type=int, default=64)
    ap.add_argument("--n-val", type=int, default=16)
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--num-classes", type=int, default=21)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    voc = generate(args.root, args.n_train, args.n_val, args.size,
                   args.num_classes, args.seed)
    print(f"wrote synthetic VOC layout at {voc}")


if __name__ == "__main__":
    main()
