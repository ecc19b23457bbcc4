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
from bacs_tpu.ops.losses import (
    cross_entropy,
    unbiased_cross_entropy,
    unbiased_knowledge_distillation,
)
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
            logits = out.logits[..., : ctx.n_cur]
        else:
            out, new_bs = ctx.forward(params, state.batch_stats, image, train, rng)
            logits = out.logits[..., : ctx.n_cur]
            if task.old_classes != 0 and train:
                nll = unbiased_cross_entropy(
                    logits, mask, task.old_classes, self.ignore_index,
                    reduction="none",
                )
            else:
                nll = cross_entropy(
                    logits, mask, self.ignore_index, reduction="none"
                )
            loss = jnp.mean(nll)  # mean over ALL pixels (reference quirk)

        if do_distill:
            old_out = ctx.forward_prev(state, image)
            old_logits = old_out.logits[..., : task.old_classes]
            loss = loss + self.lkd * unbiased_knowledge_distillation(
                logits, old_logits, alpha=1.0
            )

        updates = self.prototype_updates(ctx, state, out.penultimate, mask, train)
        return loss, StepAux(
            logits=logits, batch_stats=new_bs, state_updates=updates, metrics={},
            sem_logits=out.sem_logits[..., : ctx.n_cur],
        )
