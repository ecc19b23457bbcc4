"""The single train-state pytree carried by the jitted train step.

This replaces the reference's scattered mutable state — Lightning module
attributes, loss-object fields (`prev_model`, `_prototypes`, buffer), learner
counters (reference: training/model.py, loss/base_loss.py:20-60,
loss/prototypes.py:53-90) — with one flax.struct dataclass.  Everything that
changes during training is traced; everything static per task lives in
`TaskInfo` so each task compiles exactly once.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from bacs_tpu.train.buffer import BufferState

Array = jax.Array


@struct.dataclass
class TrainState:
    step: Array  # i32 scalar
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: Array
    # --- continual-learning state ---
    # per-task foreground prototypes (reference: loss/prototypes.py:53-90)
    prototypes: Array  # [n_tasks, D] f32
    proto_counts: Array  # [n_tasks] f32 (features accumulated per task)
    # per-class prototypes for SDR (reference: loss/sdr.py:79-118)
    class_prototypes: Optional[Array] = None  # [C, D]
    class_proto_counts: Optional[Array] = None  # [C]
    # frozen previous-task model (reference: model.clone(), base_network.py:37-50)
    prev_params: Any = None
    prev_batch_stats: Any = None
    # replay buffer (reference: training/buffer.py)
    buffer: Optional[BufferState] = None
    # PLOP median-entropy pseudo-label thresholds
    # (reference: training/utils.py:40-145)
    plop_thresholds: Optional[Array] = None  # [C]
    plop_max_entropy: Optional[Array] = None  # scalar
    # epoch bookkeeping for the seen-detector weight schedule
    # (reference: base_loss.py:241-250 uses epoch/max_epochs)
    epoch: Array = struct.field(default_factory=lambda: jnp.zeros((), jnp.int32))
    # batches consumed in the current epoch — mid-epoch checkpoint/resume
    # granularity (reference saves 2x/epoch, trainer.py:190-201)
    epoch_step: Array = struct.field(
        default_factory=lambda: jnp.zeros((), jnp.int32)
    )


class TaskInfo(struct.PyTreeNode):
    """Static per-task class bookkeeping (all python ints → hashable).

    Mirrors BaseLoss._update_task (reference: loss/base_loss.py:80-107).
    """

    task_id: int = struct.field(pytree_node=False, default=0)
    initial_classes: int = struct.field(pytree_node=False, default=0)
    increment: int = struct.field(pytree_node=False, default=0)
    num_classes: int = struct.field(pytree_node=False, default=0)  # final total
    n_tasks: int = struct.field(pytree_node=False, default=1)
    max_epochs: int = struct.field(pytree_node=False, default=1)
    ignore_index: int = struct.field(pytree_node=False, default=255)
    # domain-incremental mode: every task sees all classes
    # (reference: learner/baselearner.py:60-66 overrides nb_new/old/current
    # to num_classes for domain shift)
    domain_shift: bool = struct.field(pytree_node=False, default=False)

    @property
    def nb_current_classes(self) -> int:
        if self.domain_shift or self.increment == 0:
            return self.num_classes
        return self.initial_classes + self.increment * self.task_id

    @property
    def old_classes(self) -> int:
        if self.domain_shift:
            return self.num_classes
        if self.task_id == 0 or self.increment == 0:
            return 0
        return self.initial_classes + self.increment * (self.task_id - 1)

    @property
    def nb_new_classes(self) -> int:
        if self.domain_shift:
            return self.num_classes
        if self.task_id == 0 or self.increment == 0:
            return self.nb_current_classes
        return self.increment

    @property
    def first_task(self) -> bool:
        return self.task_id == 0

    @property
    def continual(self) -> bool:
        return self.increment > 0
