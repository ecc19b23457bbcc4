"""iCaRL: BCE against one-hot targets with old channels distilled from the
previous model (reference: loss/icarl_loss.py; training/loss_utils.py:591-620).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax

from bacs_tpu.methods.base import Method, ModelContext, StepAux
from bacs_tpu.ops.losses import cross_entropy, icarl_criterion
from bacs_tpu.train.state import TrainState


class IcarlMethod(Method):
    needs_prev_model = True

    def __init__(self, name: str = "Icarl", **kwargs):
        super().__init__(name=name, **kwargs)

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
        out, new_bs = ctx.forward(params, state.batch_stats, image, train, rng)
        logits = out.logits[..., : ctx.n_cur]
        if state.prev_params is not None and train:
            old_out = ctx.forward_prev(state, image)
            old_sig = jax.nn.sigmoid(old_out.logits[..., : task.old_classes])
            loss = icarl_criterion(
                logits, mask, old_sig, bkg=False, ignore_index=self.ignore_index
            )
        else:
            loss = cross_entropy(logits, mask, self.ignore_index)
        updates = self.prototype_updates(ctx, state, out.penultimate, mask, train)
        return loss, StepAux(
            logits=logits, batch_stats=new_bs, state_updates=updates, metrics={},
            sem_logits=out.sem_logits[..., : ctx.n_cur],
        )
