"""PLOP: entropy-guided pseudo-labels + Local POD distillation.

Redesign of the reference PlopLoss (reference: loss/plop_loss.py) and its
median-entropy threshold pass (reference: training/utils.py:40-145):

- `begin_task` (task > 0): one jitted histogram pass over the task's loader
  with the frozen previous model — per-class 100-bin histograms of normalized
  background-pixel entropy, median extracted host-side with the reference's
  exact (quirky) running-sum algorithm, floored at 0.001.
- loss: background pixels get pseudo-labels from the previous model where
  entropy < per-class median threshold (else ignore); per-sample adaptive
  factor = certain/total bg ratio; CE means over ALL pixels (reference
  reduction="none" → .mean()); plus Local POD over backbone attentions,
  ASPP output, and sem-logits (pod factors 0.01 / last-layer 0.0005).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bacs_tpu.methods.base import Method, ModelContext, StepAux
from bacs_tpu.ops.losses import (
    cross_entropy,
    features_distillation,
    pixel_entropy,
)
from bacs_tpu.train.state import TrainState

NB_BINS = 100


class PlopMethod(Method):
    needs_prev_model = True

    def __init__(
        self, name: str = "Plop", bg_weighted_ce: bool = False, **kwargs
    ):
        super().__init__(name=name, **kwargs)
        self.bg_weighted_ce = bg_weighted_ce
        self.use_logits = True
        self.classif_adaptive_factor = True

    # ------------------------------------------------------------------

    def begin_task(self, state: TrainState, ctx: ModelContext, data: Any):
        task = ctx.task
        if task.task_id == 0 or self.bg_weighted_ce:
            return state
        c_cur = task.nb_current_classes
        max_entropy = math.log(c_cur)

        c_old = task.old_classes

        @jax.jit
        def hist_batch(state, hist, image, labels):
            old = ctx.forward_prev(state, image)
            # the previous model only has old-class outputs (reference's old
            # model head width = old_classes)
            probs = jax.nn.softmax(old.logits[..., :c_old], axis=-1)
            pseudo = jnp.argmax(probs, axis=-1)
            ent = pixel_entropy(probs)  # already /log(C); reference divides
            vals = ent / max_entropy  # by log(C_cur) again (utils.py:95-97)
            mask_bg = labels == 0
            bins = jnp.clip((vals * NB_BINS).astype(jnp.int32), 0, NB_BINS - 1)
            idx = pseudo * NB_BINS + bins
            flat = jnp.zeros((c_cur * NB_BINS,), jnp.int32)
            flat = flat.at[idx.reshape(-1)].add(mask_bg.reshape(-1).astype(jnp.int32))
            return hist + flat.reshape(c_cur, NB_BINS)

        hist = jnp.zeros((c_cur, NB_BINS), jnp.int32)
        for batch in data:
            hist = hist_batch(state, hist, batch["image"], batch["label"])
        thresholds = _median_from_histogram(np.asarray(hist), base_threshold=0.001)
        # pad to full class width for static shapes
        full = np.zeros((task.num_classes,), np.float32)
        full[:c_cur] = thresholds
        return state.replace(
            plop_thresholds=jnp.asarray(full),
            plop_max_entropy=jnp.asarray(max_entropy, jnp.float32),
        )

    # ------------------------------------------------------------------

    def compute_loss(
        self,
        ctx: ModelContext,
        params: Any,
        state: TrainState,
        batch: Dict[str, jax.Array],
        train: bool,
        rng: jax.Array,
    ) -> Tuple[jax.Array, StepAux]:
        task = ctx.task
        image, mask = batch["image"], batch["label"]
        do_distill = state.prev_params is not None and train

        if self.bg_weighted_ce:
            loss, out, old_out, new_bs, _ = self.compute_base_loss(
                ctx, params, state, image, mask, train, rng,
                use_weighted_ce=self.bg_weighted_ce and do_distill,
                need_old_out=do_distill,
            )
            logits = out.logits[..., : ctx.n_cur]
            atts_new, atts_old = out.attentions, (
                old_out.attentions if old_out is not None else None
            )
        else:
            out, new_bs = ctx.forward(params, state.batch_stats, image, train, rng)
            logits = out.logits[..., : ctx.n_cur]
            atts_new = out.attentions + (out.sem_logits[..., : ctx.n_cur],)
            atts_old = None
            if do_distill:
                old_out = ctx.forward_prev(state, image)
                atts_old = old_out.attentions + (
                    old_out.sem_logits[..., : task.old_classes],
                )
                loss = self._pseudo_ce(ctx, state, out, old_out, mask)
            else:
                loss = self._plain_ce(ctx, out, mask)

        if do_distill and atts_old is not None:
            pod = features_distillation(
                atts_old,
                atts_new,
                index_new_class=task.old_classes,
                nb_current_classes=task.nb_current_classes,
                nb_new_classes=task.nb_new_classes,
                pod_factor=0.01,
                last_layer_factor=0.0005,
                spp_scales=(1, 2, 4),
            )
            loss = loss + pod

        updates = self.prototype_updates(ctx, state, out.penultimate, mask, train)
        return loss, StepAux(
            logits=logits, batch_stats=new_bs, state_updates=updates, metrics={},
            sem_logits=out.sem_logits[..., : ctx.n_cur],
        )

    def _plain_ce(self, ctx: ModelContext, out, mask):
        """Plain CE with PLOP's mean-over-ALL-pixels reduction, through the
        fused upsample+CE gate (full-res logits never exist on the kernel
        paths)."""
        sem = out.sem_logits[..., : ctx.n_cur]
        use_fused, spatial = self._fused_gate(ctx, sem, mask)
        n_tot = mask.shape[0] * mask.shape[1] * mask.shape[2]
        if use_fused and spatial is not None:
            from bacs_tpu.ops.upsample_ce import spatial_upsampled_mib_ce

            return spatial_upsampled_mib_ce(
                sem, mask, mask.shape[1:3], spatial, 0, self.ignore_index
            )
        if use_fused:
            from bacs_tpu.ops.upsample_ce import upsampled_ce_sums

            ls, _ = upsampled_ce_sums(
                sem, mask, mask.shape[1:3], self.ignore_index, None
            )
            return ls / n_tot
        nll = cross_entropy(
            out.logits[..., : ctx.n_cur], mask, self.ignore_index,
            reduction="none",
        )
        return jnp.mean(nll)

    def _pseudo_ce(self, ctx: ModelContext, state: TrainState, out, old_out,
                   mask):
        """Pseudo-label CE: entropy-gated teacher labels on bg pixels, the
        per-sample adaptive factor, mean over ALL pixels.  On the fused
        paths the teacher's full-res softmax/entropy/argmax and the
        student's full-res logits never materialize
        (ops/upsample_ce.upsampled_plop_pseudo_labels +
        upsampled_ce_sums_per_image)."""
        task = ctx.task
        sem = out.sem_logits[..., : ctx.n_cur]
        sem_old = old_out.sem_logits[..., : task.old_classes]
        use_fused, spatial = self._fused_gate(ctx, sem, mask)
        n_tot = mask.shape[0] * mask.shape[1] * mask.shape[2]
        if not self.classif_adaptive_factor and spatial is not None:
            # non-default flag: the spatial wrapper bakes in the adaptive
            # factor — drop to the composed global path (GSPMD-safe)
            use_fused = False
        if use_fused and spatial is not None:
            from bacs_tpu.ops.upsample_ce import spatial_plop_pseudo_ce

            return spatial_plop_pseudo_ce(
                sem, sem_old, mask, state.plop_thresholds,
                state.plop_max_entropy, mask.shape[1:3], spatial,
                self.ignore_index,
            )
        if use_fused:
            from bacs_tpu.ops.upsample_ce import (
                upsampled_ce_sums_per_image,
                upsampled_plop_pseudo_labels,
            )

            pseudo, num, den = upsampled_plop_pseudo_labels(
                sem_old, mask, state.plop_thresholds, mask.shape[1:3],
                state.plop_max_entropy, self.ignore_index,
            )
            if self.classif_adaptive_factor:
                factor = jnp.clip(num / jnp.maximum(den, 1.0), 0.0, None)
            else:
                factor = jnp.ones((mask.shape[0],), jnp.float32)
            ls, _ = upsampled_ce_sums_per_image(
                sem, pseudo, mask.shape[1:3], self.ignore_index, None
            )
            return jnp.sum(factor * ls) / n_tot
        old_logits = old_out.logits[..., : task.old_classes]
        pseudo_mask, factor = self._pseudo_labels(state, mask, old_logits)
        nll = cross_entropy(
            out.logits[..., : ctx.n_cur], pseudo_mask, self.ignore_index,
            reduction="none",
        )
        return jnp.mean(factor[:, None, None] * nll)

    def _pseudo_labels(self, state: TrainState, labels, old_logits):
        """(reference: plop_loss.py:67-124 `_preprocess_labels`)."""
        task_old = old_logits.shape[-1]
        probs = jax.nn.softmax(old_logits, axis=-1)
        pseudo = jnp.argmax(probs, axis=-1).astype(labels.dtype)
        mask_bg = labels < task_old
        ent = pixel_entropy(probs) / state.plop_max_entropy
        valid = ent < state.plop_thresholds[pseudo]
        new_labels = jnp.where(~valid & mask_bg, self.ignore_index, labels)
        new_labels = jnp.where(valid & mask_bg, pseudo, new_labels)
        if self.classif_adaptive_factor:
            num = jnp.sum((valid & mask_bg).astype(jnp.float32), axis=(1, 2))
            den = jnp.sum(mask_bg.astype(jnp.float32), axis=(1, 2))
            factor = jnp.clip(num / jnp.maximum(den, 1.0), 0.0, None)
        else:
            factor = jnp.ones((labels.shape[0],), jnp.float32)
        return new_labels, factor


def _median_from_histogram(
    histograms: np.ndarray, base_threshold: float = 0.001
) -> np.ndarray:
    """The reference's literal histogram-median recurrence
    (reference: training/utils.py:110-145, shared with the original PLOP
    release — including its running-sum quirk, kept for parity)."""
    c, nb_bins = histograms.shape
    thresholds = np.zeros((c,), np.float32)
    for cls in range(c):
        total = histograms[cls].sum()
        if total <= 0:
            thresholds[cls] = base_threshold  # reference floors ALL classes
            continue
        half = total / 2
        running_sum = 0.0
        lower_border = 0.0
        bin_index = 0
        for b in range(nb_bins):
            lower_border = b / nb_bins
            bin_index = int(lower_border * nb_bins)
            if running_sum <= half <= (running_sum + histograms[cls, bin_index]):
                break
            running_sum += lower_border * nb_bins
        median = lower_border + (
            (half - running_sum) / max(histograms[cls, bin_index], 1)
        ) * (1.0 / nb_bins)
        thresholds[cls] = max(median, base_threshold)
    return thresholds
