"""MiB: unbiased CE + unbiased knowledge distillation (reference: loss/mib.py).

Loss for task > 0 (train):
    UCE(new_logits, mask) + 10 · UKD(new_logits, old_logits)
with the reference's reduction quirk preserved: both CE terms are
reduction="none" then `.mean()` over ALL pixels including ignored ones
(reference: mib.py:23,73-76 — ignored pixels contribute 0 to the numerator
but count in the denominator).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from bacs_tpu.methods.base import Method, ModelContext, StepAux
from bacs_tpu.ops.losses import cross_entropy, unbiased_cross_entropy
from bacs_tpu.train.state import TrainState


class MiBMethod(Method):
    needs_prev_model = True

    def __init__(
        self, name: str = "MiB", bg_weighted_ce: bool = False, lkd: float = 10.0,
        **kwargs,
    ):
        super().__init__(name=name, **kwargs)
        self.bg_weighted_ce = bg_weighted_ce
        self.lkd = lkd

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

        if self.bg_weighted_ce and train:
            loss, out, _, new_bs, _ = self.compute_base_loss(
                ctx, params, state, image, mask, train, rng,
                use_weighted_ce=task.old_classes != 0,
            )
        else:
            out, new_bs = ctx.forward(params, state.batch_stats, image, train, rng)
            loss = self._mib_ce(ctx, out, mask, train)

        if do_distill:
            old_out = ctx.forward_prev(state, image)
            loss = loss + self.lkd * self.ukd_with_upsample(
                ctx, out, old_out, mask
            )

        updates = self.prototype_updates(ctx, state, out.penultimate, mask, train)
        return loss, StepAux(
            logits=out.logits[..., : ctx.n_cur],
            batch_stats=new_bs, state_updates=updates, metrics={},
            sem_logits=out.sem_logits[..., : ctx.n_cur],
        )

    def _mib_ce(self, ctx: ModelContext, out, mask, train):
        """(Unbiased when old classes exist and training) CE with MiB's
        mean-over-ALL-pixels reduction (reference: mib.py:23,73-76 —
        ignored pixels contribute 0 to the numerator but count in the
        denominator), through the fused upsample+CE gate: on the kernel
        paths the full-res logits never materialize."""
        task = ctx.task
        sem = out.sem_logits[..., : ctx.n_cur]
        unbiased = task.old_classes != 0 and train
        use_fused, spatial = self._fused_gate(ctx, sem, mask)
        n_tot = mask.shape[0] * mask.shape[1] * mask.shape[2]
        if use_fused and spatial is not None:
            from bacs_tpu.ops.upsample_ce import spatial_upsampled_mib_ce

            return spatial_upsampled_mib_ce(
                sem, mask, mask.shape[1:3], spatial,
                task.old_classes if unbiased else 0, self.ignore_index,
            )
        if use_fused:
            from bacs_tpu.ops.upsample_ce import (
                upsampled_ce_sums,
                upsampled_uce_sums,
            )

            if unbiased:
                ls, _ = upsampled_uce_sums(
                    sem, mask, mask.shape[1:3], task.old_classes,
                    self.ignore_index, None,
                )
            else:
                ls, _ = upsampled_ce_sums(
                    sem, mask, mask.shape[1:3], self.ignore_index, None
                )
            return ls / n_tot
        logits = out.logits[..., : ctx.n_cur]
        if unbiased:
            nll = unbiased_cross_entropy(
                logits, mask, task.old_classes, self.ignore_index,
                reduction="none",
            )
        else:
            nll = cross_entropy(
                logits, mask, self.ignore_index, reduction="none"
            )
        return jnp.mean(nll)  # mean over ALL pixels (reference quirk)

