"""OOD / seen-detector auxiliary evaluation.

Redesign of the reference OODModel (reference: training/ood_model.py): during
val/test, the BgDetector's max seen-probability is thresholded at 0.5 into a
binary fg/bg prediction and scored against the fg/bg ground truth (2-class
IoU + probability statistics); an optional OOD dataset pass treats every
pixel as unseen (target 0) and reports F1(pos_label=0) + accuracy.
"""

from __future__ import annotations

import functools
from typing import Dict, Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bacs_tpu.methods.base import ModelContext
from bacs_tpu.ops.confusion import confusion_matrix, iou_from_confusion
from bacs_tpu.train.state import TrainState

Array = jax.Array


@functools.lru_cache(maxsize=16)
def _aux_bg_jitted(ctx: ModelContext):
    return jax.jit(functools.partial(_aux_bg_impl, ctx))


def aux_bg_step(
    ctx: ModelContext,
    state: TrainState,
    batch: Dict[str, Array],
    conf2: Array,
) -> Tuple[Array, Dict[str, Array]]:
    return _aux_bg_jitted(ctx)(state, batch, conf2)


def _aux_bg_impl(
    ctx: ModelContext,
    state: TrainState,
    batch: Dict[str, Array],
    conf2: Array,
) -> Tuple[Array, Dict[str, Array]]:
    """One eval batch of the seen/unseen aux metrics
    (reference: ood_model.py:114-174 `step`)."""
    task = ctx.task
    ignore = task.ignore_index
    mask = batch["label"]
    out, _ = ctx.forward(state.params, state.batch_stats, batch["image"], False)
    seen_prob = jnp.max(
        ctx.seen_probs(
            state.params, state.batch_stats, out.penultimate, state.prototypes
        ),
        axis=-1,
    )
    target = jnp.where(mask == ignore, ignore, (mask != 0).astype(jnp.int32))
    preds = (seen_prob > 0.5).astype(jnp.int32)
    conf2 = conf2 + confusion_matrix(preds, target, 2, ignore_index=ignore)

    def _stats(sel):
        cnt = jnp.sum(sel)
        mean = jnp.sum(seen_prob * sel) / jnp.maximum(cnt, 1)
        var = jnp.sum(jnp.square(seen_prob - mean) * sel) / jnp.maximum(cnt, 1)
        return mean, var

    stats = {}
    bg_m, bg_v = _stats((target == 0).astype(jnp.float32))
    fg_m, fg_v = _stats((target == 1).astype(jnp.float32))
    stats["bg_prob_mean"], stats["bg_prob_var"] = bg_m, bg_v
    stats["fg_prob_mean"], stats["fg_prob_var"] = fg_m, fg_v
    cur = (
        (target == 1) & (mask >= task.old_classes) & (mask <= task.nb_current_classes)
    ).astype(jnp.float32)
    stats["fg_current_prob_mean"], stats["fg_current_prob_var"] = _stats(cur)
    if task.old_classes > 0:
        old = ((target != 0) & (mask <= task.old_classes)).astype(jnp.float32)
        stats["old_cl_prob_mean"], stats["old_cl_prob_var"] = _stats(old)
    return conf2, stats


def aux_bg_summary(conf2: np.ndarray) -> Dict[str, float]:
    """2-class IoU summary with the reference's metric names
    (reference: ood_model.py:63-101 `_log_iou`)."""
    m = iou_from_confusion(jnp.asarray(conf2))
    iou = np.asarray(m.iou_per_class)
    return {
        "IoU-bg": float(iou[0]),
        "IoU-not-bg": float(iou[1]),
        "mIoU": float(iou.mean()),
        "Accuracy": float(np.asarray(m.accuracy).mean()),
        "Precision": float(np.asarray(m.precision).mean()),
        "Recall": float(np.asarray(m.recall).mean()),
    }


def ood_test(
    ctx: ModelContext,
    state: TrainState,
    batches: Iterator[Dict[str, Array]],
) -> Dict[str, float]:
    """OOD pass: all pixels are unseen; score the LAST task head's
    seen-probability (reference: ood_model.py:175-210 `test_step`)."""

    @jax.jit
    def step(state, image):
        out, _ = ctx.forward(state.params, state.batch_stats, image, False)
        seen_prob = ctx.seen_probs(
            state.params, state.batch_stats, out.penultimate, state.prototypes
        )[..., -1]
        pred_seen = seen_prob > 0.5
        # targets all 0 (unseen): F1 with pos_label=0 ⇒ positives = unseen
        tp = jnp.sum(~pred_seen)  # predicted unseen, truly unseen
        fn = jnp.sum(pred_seen)
        total = pred_seen.size
        return (
            tp,
            fn,
            jnp.mean(seen_prob),
            jnp.var(seen_prob),
            jnp.asarray(total),
        )

    tps, fns, totals = 0, 0, 0
    means = []
    for batch in batches:
        tp, fn, m, v, total = step(state, batch["image"])
        tps += int(tp)
        fns += int(fn)
        totals += int(total)
        means.append(float(m))
    # pos_label=0, no false positives possible (all targets are 0):
    # precision = 1, recall = tp/(tp+fn)
    recall = tps / max(tps + fns, 1)
    f1 = 2 * recall / (1 + recall) if recall > 0 else 0.0
    acc = tps / max(totals, 1)
    return {
        "F1_score_current": f1,
        "Accuracy_current": acc,
        "ood_detection_prob_mean": float(np.mean(means)) if means else 0.0,
    }
