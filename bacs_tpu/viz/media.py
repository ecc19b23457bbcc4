"""Segmentation media logging: VOC colormap + prediction collages to disk.

Redesign of the reference LogMedia (reference: visualization/log_media.py and
base_medialogger.py:56-81): the bit-twiddle VOC palette and input/GT/pred
collage grids, written with PIL (wandb optional).  The reference's
`get_common_batch` crash (SURVEY §2.11 latent bug) is fixed by letting the
trainer hand batches in explicitly.
"""

from __future__ import annotations

import os
from collections import deque
from typing import Deque, Dict, Optional

import numpy as np

from bacs_tpu.data.transforms import denormalize_image


def voc_colormap(n: int = 256) -> np.ndarray:
    """[n, 3] uint8 VOC palette (reference: base_medialogger.py:56-81)."""
    cmap = np.zeros((n, 3), np.uint8)
    for i in range(n):
        r = g = b = 0
        c = i
        for j in range(8):
            r |= ((c >> 0) & 1) << (7 - j)
            g |= ((c >> 1) & 1) << (7 - j)
            b |= ((c >> 2) & 1) << (7 - j)
            c >>= 3
        cmap[i] = (r, g, b)
    return cmap


class MediaLogger:
    """Keeps the last N batches per split and writes collages at task end
    (reference: LogMediaQueue, base_medialogger.py:14-53)."""

    def __init__(self, out_dir: str, max_len: int = 3, max_samples: int = 8):
        self.out_dir = out_dir
        self.max_samples = max_samples
        self.queues: Dict[str, Deque] = {}
        self.max_len = max_len
        self.cmap = voc_colormap()

    def append(self, split: str, image, label, pred) -> None:
        q = self.queues.setdefault(split, deque(maxlen=self.max_len))
        q.append(
            (
                np.asarray(image[: self.max_samples]),
                np.asarray(label[: self.max_samples]),
                np.asarray(pred[: self.max_samples]),
            )
        )

    def _colorize(self, labels: np.ndarray) -> np.ndarray:
        return self.cmap[np.clip(labels, 0, 255)]

    def flush(self, task_id: int) -> Optional[str]:
        """Write one collage image per split: rows = samples, cols =
        [input | GT | pred] (reference: log_media.py:141-290)."""
        from PIL import Image

        os.makedirs(self.out_dir, exist_ok=True)
        last_path = None
        for split, q in self.queues.items():
            if not q:
                continue
            image, label, pred = q[-1]
            img_u8 = np.asarray(denormalize_image(image))
            rows = []
            for i in range(image.shape[0]):
                rows.append(
                    np.concatenate(
                        [
                            img_u8[i],
                            self._colorize(label[i]),
                            self._colorize(pred[i]),
                        ],
                        axis=1,
                    )
                )
            collage = np.concatenate(rows, axis=0)
            path = os.path.join(
                self.out_dir, f"task{task_id}_{split.replace('/', '_')}.png"
            )
            Image.fromarray(collage).save(path)
            last_path = path
        return last_path

    def log_wandb(self, logger, task_id: int, class_names=None) -> None:
        """Log interactive segmentation-mask images to wandb, one Image per
        sample with prediction + ground-truth mask layers under
        `<Split>/Task <t>/Predictions` (reference: log_media.py:265-290
        `_log_media_to_wandb`; the "groud_truth" key spelling is the
        reference's, kept so wandb panels line up across frameworks)."""
        wandb = getattr(logger, "_wandb", None)
        if wandb is None:
            return
        class_labels = (
            {i: str(n) for i, n in enumerate(class_names)}
            if class_names else None
        )
        for split, q in self.queues.items():
            if not q:
                continue
            image, label, pred = q[-1]
            imgs = np.asarray(denormalize_image(image))
            mask_list = []
            for i in range(imgs.shape[0]):
                masks = {
                    "predictions": {
                        "mask_data": np.asarray(pred[i], np.uint8)
                    },
                    "groud_truth": {
                        "mask_data": np.asarray(label[i], np.uint8)
                    },
                }
                if class_labels is not None:
                    for layer in masks.values():
                        layer["class_labels"] = class_labels
                mask_list.append(wandb.Image(imgs[i], masks=masks))
            wandb.log(
                {f"{split.title()}/Task {task_id}/Predictions": mask_list},
                commit=False,
            )
