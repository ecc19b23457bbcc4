"""Offline box-plot of per-class IoU across methods/seeds from CSV exports.

Equivalent of the reference's wandb-CSV plotting script
(reference: visualization/draw_boxplot.py): reads a CSV with columns
`method,seed,class,iou` (class = integer id) and draws grouped box plots for
classes 0-15 / 16-20 / all, matching the reference's VOC 15-1 grouping.

Usage: python scripts/draw_boxplot.py results.csv out.png
"""

from __future__ import annotations

import csv
import sys
from collections import defaultdict


def main(csv_path: str, out_path: str = "boxplot.png"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = []
    with open(csv_path) as f:
        for row in csv.DictReader(f):
            rows.append(
                (row["method"], int(row["class"]), float(row["iou"]))
            )
    methods = sorted({m for m, _, _ in rows})
    groups = {
        "0-15": lambda c: c <= 15,
        "16-20": lambda c: c >= 16,
        "all": lambda c: True,
    }
    fig, axes = plt.subplots(1, len(groups), figsize=(4 * len(groups), 4))
    for ax, (gname, pred) in zip(axes, groups.items()):
        data = []
        for m in methods:
            data.append([iou for mm, c, iou in rows if mm == m and pred(c)])
        ax.boxplot(data, tick_labels=methods)
        ax.set_title(f"classes {gname}")
        ax.set_ylabel("IoU")
        ax.tick_params(axis="x", rotation=30)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
