"""Jitted confusion-matrix accumulation and IoU derivation.

Replaces the reference's torchmetrics JaccardIndex wrapper
(reference: training/metrics.py:20-102) with a scatter-add on device: the
confusion matrix lives in the eval-state pytree and is accumulated per batch
inside jit, so evaluation never syncs to host until the final compute.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


def confusion_matrix(
    preds: Array,
    labels: Array,
    num_classes: int,
    ignore_index: int = 255,
) -> Array:
    """[num_classes, num_classes] confusion matrix; rows=target, cols=pred.

    Pixels with label outside [0, num_classes) are dropped
    (reference: training/metrics.py:38-50 masks `(t >= 0) & (t < C)`).
    """
    t = labels.reshape(-1).astype(jnp.int32)
    p = preds.reshape(-1).astype(jnp.int32)
    valid = (t >= 0) & (t < num_classes)
    t = jnp.where(valid, t, 0)
    p = jnp.clip(p, 0, num_classes - 1)
    idx = t * num_classes + p
    flat = jnp.zeros((num_classes * num_classes,), jnp.int32)
    flat = flat.at[idx].add(valid.astype(jnp.int32))
    return flat.reshape(num_classes, num_classes)


class IouMetrics(NamedTuple):
    """Per-class metric vectors derived from an accumulated confusion matrix.

    Mirrors the reference dataclass (training/metrics.py:11-18).
    """

    iou_per_class: Array
    miou: Array
    accuracy: Array
    precision: Array
    recall: Array
    specificity: Array


def iou_from_confusion(conf_mat: Array) -> IouMetrics:
    """Derive IoU/accuracy/precision/recall/specificity per class.

    NaN entries become 0, matching the reference (training/metrics.py:52-88);
    the per-class IoU itself keeps torchmetrics reduction="none" semantics
    where a class absent from both pred and target yields NaN→ replaced by 0
    only in the aggregate stats but kept as-is for iou (torchmetrics returns
    0/0 = nan... the reference then averages, we emit 0 for absent classes
    and mean over all classes like `iou_per_class.mean()`).
    """
    cm = conf_mat.astype(jnp.float32)
    tp = jnp.diagonal(cm)
    fn = jnp.sum(cm, axis=1) - tp  # row sum = target count
    fp = jnp.sum(cm, axis=0) - tp  # col sum = predicted count
    total = jnp.sum(cm)
    tn = total - (tp + fn + fp)

    def _safe(num, den):
        return jnp.where(den > 0, num / jnp.maximum(den, 1.0), 0.0)

    iou = _safe(tp, tp + fp + fn)
    accuracy = _safe(tp + tn, tp + fp + fn + tn)
    precision = _safe(tp, tp + fp)
    recall = _safe(tp, tp + fn)
    specificity = _safe(tn, tn + fp)
    return IouMetrics(
        iou_per_class=iou,
        miou=jnp.mean(iou),
        accuracy=accuracy,
        precision=precision,
        recall=recall,
        specificity=specificity,
    )
