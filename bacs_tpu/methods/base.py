"""Method base: shared forward helpers + the BACS-family base loss core.

Functional redesign of the reference's BaseLoss plugin
(reference: loss/base_loss.py): the mutable lifecycle-hook object becomes a
stateless `Method` whose `compute_loss` is traced into the train step and
returns, besides the scalar loss, a dict of train-state field updates
(prototypes, buffer, ...) that the step applies — replacing in-place mutation
of loss-object attributes.  Host-level hooks (`begin_task`, `end_task`) run
jitted passes over loaders at task boundaries.

`ModelContext` is static per task (hashable), so each task compiles once.
"""

from __future__ import annotations

import functools
import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from bacs_tpu.models.base import NetOutput
from bacs_tpu.ops.interpolate import resize_nearest
from bacs_tpu.ops.losses import (
    binary_focal_loss,
    cross_entropy,
    weighted_cross_entropy,
)
from bacs_tpu.train.state import TaskInfo, TrainState

Array = jax.Array


class StepAux(NamedTuple):
    """What compute_loss returns besides the scalar loss."""

    logits: Array  # [N, H, W, C_active] for predictions/IoU
    batch_stats: Any  # updated BN statistics
    state_updates: Dict[str, Any]  # TrainState field updates to apply
    metrics: Dict[str, Array]
    # pre-upsample logits (active classes) — lets the eval step compute the
    # confusion matrix via the fused kernel without materializing full-res
    # logits (ops/upsample_confusion.py)
    sem_logits: Optional[Array] = None


@dataclasses.dataclass(frozen=True)
class ModelContext:
    """Static bundle: the network module + task info (hashable for jit)."""

    model: Any  # flax module (frozen dataclass → hashable)
    task: TaskInfo
    axis_name: Optional[str] = None  # data mesh axis inside shard_map
    # config-keyed gate for the fused upsample+CE Pallas kernels
    # (training.fused_ce; replaces the round-2 BACS_FUSED_UPSAMPLE_CE env var)
    fused_ce: bool = True
    # the (data, space) Mesh when GSPMD spatial partitioning is active: the
    # fused kernels then run shard_map'ped per space-shard with halo
    # exchange (ops/upsample_ce.py spatial_* wrappers) instead of turning off
    spatial_mesh: Any = None  # jax.sharding.Mesh is hashable

    # --- forward helpers -------------------------------------------------
    def forward(
        self,
        params: Any,
        batch_stats: Any,
        x: Array,
        train: bool,
        rng: Optional[Array] = None,
    ) -> Tuple[NetOutput, Any]:
        variables = {"params": params, "batch_stats": batch_stats}
        rngs = {"dropout": rng} if (train and rng is not None) else None
        if train:
            out, mut = self.model.apply(
                variables, x, train=True, mutable=["batch_stats"], rngs=rngs
            )
            return out, mut["batch_stats"]
        out = self.model.apply(variables, x, train=False)
        return out, batch_stats

    def forward_prev(self, state: TrainState, x: Array) -> NetOutput:
        """Frozen previous-task model, eval mode (reference: freeze_network)."""
        variables = {
            "params": state.prev_params,
            "batch_stats": state.prev_batch_stats,
        }
        out = self.model.apply(variables, x, train=False)
        return jax.tree.map(jax.lax.stop_gradient, out)

    def seen_map_task(
        self, params, batch_stats, penultimate, prototypes, task_num, stop_grads
    ) -> Array:
        return self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            penultimate,
            prototypes,
            task_num,
            stop_grads,
            method="seen_map_task",
        )

    def seen_probs(self, params, batch_stats, penultimate, prototypes) -> Array:
        """Sigmoid seen-probs over all prototypes initialized so far."""
        n_active = self.task.task_id + 1
        return self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            penultimate,
            prototypes,
            n_active,
            method="seen_probs",
        )

    @property
    def n_cur(self) -> int:
        return self.task.nb_current_classes


def label_task_ids(labels: Array, task: TaskInfo) -> Array:
    """Map each label to its task index (reference: base_loss.py:98-107)."""
    if task.increment <= 0:
        return jnp.zeros_like(labels)
    t = jnp.rint(
        (labels.astype(jnp.float32) + 1.0 - task.initial_classes) / task.increment
    )
    return jnp.clip(t, 0, task.n_tasks - 1).astype(jnp.int32)


def update_task_prototypes(
    prototypes: Array,
    counts: Array,
    penultimate: Array,
    labels: Array,
    task: TaskInfo,
    axis_name: Optional[str] = None,
) -> Tuple[Array, Array]:
    """Running-mean per-task foreground prototypes, vectorized.

    Per task t: mean of penultimate features over pixels whose
    nearest-downsampled label belongs to task t (bg and ignore excluded),
    folded into a running mean with per-task counts
    (reference: loss/prototypes.py:127-205).
    """
    feats = jax.lax.stop_gradient(penultimate.astype(jnp.float32))
    n, h, w, d = feats.shape
    labels_down = resize_nearest(labels, (h, w))
    valid = (labels_down != 0) & (labels_down != task.ignore_index)
    tids = label_task_ids(labels_down, task)
    t_onehot = (
        jax.nn.one_hot(tids, task.n_tasks, dtype=jnp.float32) * valid[..., None]
    )
    sums = jnp.einsum("nhwt,nhwd->td", t_onehot, feats)
    n_feats = jnp.sum(t_onehot, axis=(0, 1, 2))
    if axis_name is not None:
        sums, n_feats = jax.lax.psum((sums, n_feats), axis_name)
    new_counts = counts + n_feats
    new_protos = jnp.where(
        (n_feats > 0)[:, None],
        (sums + counts[:, None] * prototypes)
        / jnp.maximum(new_counts, 1.0)[:, None],
        prototypes,
    )
    return new_protos, new_counts


def prototypes_ready(state: TrainState, task: TaskInfo) -> Array:
    """All prototypes up to the current task have seen data
    (reference: loss/prototypes.py:31-40 checks count_nonzero == len)."""
    active = state.proto_counts[: task.task_id + 1]
    return jnp.all(active > 0)


class Method:
    """Base method (= fine-tuning CE core when used directly).

    Flags mirror the reference BaseLoss/__init__ wiring
    (reference: loss/base_loss.py:10-78, training/trainer.py:242-252).
    """

    needs_prev_model = False
    needs_buffer = False
    needs_class_prototypes = False

    def __init__(
        self,
        name: str = "base",
        ignore_index: int = 255,
        use_bg_detector: bool = False,
        track_prototypes: bool = False,
        seen_gamma: float = 2.0,
        seen_threshold: float = 0.5,
        seen_ukd: bool = True,
        seen_focal_alpha: Optional[float] = None,
        **_: Any,
    ):
        self.name = name
        self.ignore_index = ignore_index
        self.use_bg_detector = use_bg_detector
        self.track_prototypes = track_prototypes or use_bg_detector
        self.seen_gamma = seen_gamma
        self.seen_threshold = seen_threshold
        self.seen_ukd = seen_ukd
        self.seen_focal_alpha = seen_focal_alpha

    # ------------------------------------------------------------------
    # device-pure loss
    # ------------------------------------------------------------------

    def compute_loss(
        self,
        ctx: ModelContext,
        params: Any,
        state: TrainState,
        batch: Dict[str, Array],
        train: bool,
        rng: Array,
    ) -> Tuple[Array, StepAux]:
        loss, out, _, new_bs, _ = self.compute_base_loss(
            ctx, params, state, batch["image"], batch["label"], train, rng
        )
        updates = self.prototype_updates(
            ctx, state, out.penultimate, batch["label"], train
        )
        return loss, StepAux(
            logits=out.logits[..., : ctx.n_cur],
            batch_stats=new_bs,
            state_updates=updates,
            metrics={},
            sem_logits=out.sem_logits[..., : ctx.n_cur],
        )

    def prototype_updates(
        self,
        ctx: ModelContext,
        state: TrainState,
        penultimate: Array,
        labels: Array,
        train: bool,
        base: Optional[Dict[str, Any]] = None,
    ) -> Dict[str, Any]:
        """Fold a batch into the per-task prototypes (train only)."""
        updates = dict(base or {})
        if not (train and self.track_prototypes):
            return updates
        protos = updates.get("prototypes", state.prototypes)
        counts = updates.get("proto_counts", state.proto_counts)
        protos, counts = update_task_prototypes(
            protos, counts, penultimate, labels, ctx.task, ctx.axis_name
        )
        updates["prototypes"] = protos
        updates["proto_counts"] = counts
        return updates

    @staticmethod
    def _fused_gate(ctx, sem, labels):
        """THE fused upsample+CE kernel gate — the single decision point
        for every CE variant (compute_base_loss and the merged-replay β
        term): kernel when the head output is below label resolution,
        spatial shard_map wrappers under GSPMD when the shapes divide the
        mesh, XLA-composed fallback otherwise."""
        use_fused_ce = sem.shape[1] < labels.shape[1] and ctx.fused_ce
        spatial = ctx.spatial_mesh
        if spatial is not None:
            from bacs_tpu.ops.upsample_ce import spatial_shapes_ok

            if not spatial_shapes_ok(
                spatial, labels.shape[0], labels.shape[1], sem.shape[1]
            ):
                # shapes don't divide the mesh (e.g. a small replay
                # minibatch): drop to the XLA-composed global path, which
                # GSPMD partitions natively — identical math, just unfused
                use_fused_ce = False
                spatial = None
        return use_fused_ce, spatial

    def ce_with_upsample(self, ctx, sem, logits, labels, class_weights=None):
        """Plain / class-weighted CE through the shared _fused_gate.

        `sem` is the pre-upsample head output, `logits` the upsampled
        full-res logits (only touched on the fallback path — on the kernel
        paths the full-res logits never materialize; in the full train step
        the XLA-composed resize+CE costs +66 ms of memory-pressure
        scheduling vs ~4 ms for the kernel, measured 512² b16)."""
        use_fused_ce, spatial = self._fused_gate(ctx, sem, labels)
        if use_fused_ce and class_weights is None and spatial is not None:
            from bacs_tpu.ops.upsample_ce import (
                spatial_upsampled_cross_entropy,
            )

            return spatial_upsampled_cross_entropy(
                sem, labels, labels.shape[1:3], spatial, self.ignore_index
            )
        if use_fused_ce and class_weights is None:
            from bacs_tpu.ops.upsample_ce import upsampled_cross_entropy

            return upsampled_cross_entropy(
                sem, labels, labels.shape[1:3], self.ignore_index
            )
        if use_fused_ce and spatial is not None:
            from bacs_tpu.ops.upsample_ce import (
                spatial_upsampled_weighted_cross_entropy,
            )

            return spatial_upsampled_weighted_cross_entropy(
                sem, labels, class_weights, labels.shape[1:3], spatial,
                self.ignore_index,
            )
        if use_fused_ce:
            # replay CE with per-class weights rides the same kernel
            # (torch weighted-mean semantics)
            from bacs_tpu.ops.upsample_ce import (
                upsampled_weighted_cross_entropy,
            )

            return upsampled_weighted_cross_entropy(
                sem, labels, class_weights, labels.shape[1:3],
                self.ignore_index,
            )
        return cross_entropy(
            logits,
            labels,
            ignore_index=self.ignore_index,
            class_weights=class_weights,
        )

    def uce_with_upsample(self, ctx, sem, logits, labels, old_classes):
        """MiB-style unbiased CE, mean over VALID pixels (SDR's reduction;
        ops/losses.unbiased_cross_entropy semantics) through the shared
        fused gate — full-res logits only exist on the fallback path."""
        use_fused, spatial = self._fused_gate(ctx, sem, labels)
        if use_fused and spatial is not None:
            from bacs_tpu.ops.upsample_ce import (
                spatial_upsampled_unbiased_cross_entropy,
            )

            return spatial_upsampled_unbiased_cross_entropy(
                sem, labels, labels.shape[1:3], spatial, old_classes,
                self.ignore_index,
            )
        if use_fused:
            from bacs_tpu.ops.upsample_ce import (
                upsampled_unbiased_cross_entropy,
            )

            return upsampled_unbiased_cross_entropy(
                sem, labels, labels.shape[1:3], old_classes,
                self.ignore_index,
            )
        from bacs_tpu.ops.losses import unbiased_cross_entropy

        return unbiased_cross_entropy(
            logits, labels, old_classes, self.ignore_index
        )

    def ukd_with_upsample(self, ctx, out, old_out, labels, alpha=1.0):
        """MiB's unbiased KD vs the frozen previous model (mean over ALL
        pixels) through the fused gate — neither the student's nor the
        teacher's full-res logits exist on the kernel path (the teacher
        side is stop-gradient by KD semantics).  Shared by MiB and SDR."""
        task = ctx.task
        sem_new = out.sem_logits[..., : ctx.n_cur]
        sem_old = old_out.sem_logits[..., : task.old_classes]
        use_fused, spatial = self._fused_gate(ctx, sem_new, labels)
        if use_fused and spatial is not None:
            from bacs_tpu.ops.upsample_ce import (
                spatial_upsampled_unbiased_kd,
            )

            return spatial_upsampled_unbiased_kd(
                sem_new, sem_old, labels.shape[1:3], spatial, alpha=alpha
            )
        if use_fused:
            from bacs_tpu.ops.upsample_ce import upsampled_unbiased_kd

            return upsampled_unbiased_kd(
                sem_new, sem_old, labels.shape[1:3], alpha=alpha
            )
        from bacs_tpu.ops.losses import unbiased_knowledge_distillation

        return unbiased_knowledge_distillation(
            out.logits[..., : ctx.n_cur],
            old_out.logits[..., : task.old_classes],
            alpha=alpha,
        )

    def compute_base_loss(
        self,
        ctx: ModelContext,
        params: Any,
        state: TrainState,
        image: Array,
        labels: Array,
        train: bool,
        rng: Array,
        task_num: int = -1,
        class_weights: Optional[Array] = None,
        use_weighted_ce: bool = False,
        need_old_out: bool = False,
        is_replay: bool = False,
        same_task: bool = False,
        batch_stats: Any = None,
        proto_base: Optional[Tuple[Array, Array]] = None,
    ):
        """The shared CE(+seen-detector) core
        (reference: loss/base_loss.py:172-253 `compute_base_loss`).

        Returns (loss, out, old_out, new_batch_stats, seen_prob).
        """
        task = ctx.task
        bs = state.batch_stats if batch_stats is None else batch_stats
        out, new_bs = ctx.forward(params, bs, image, train, rng)
        old_out = None
        if need_old_out and train and state.prev_params is not None:
            old_out = ctx.forward_prev(state, image)

        logits = out.logits[..., : ctx.n_cur]
        seen_prob = None
        # the reference folds the current batch into the prototypes BEFORE
        # the seen detector reads them (base_loss.py:219-231); mirror with a
        # local fold here — the state update itself still flows through
        # prototype_updates, so nothing is double-counted.  `proto_base`
        # lets replay calls chain on top of the main batch's fold.
        protos = state.prototypes if proto_base is None else proto_base[0]
        counts = state.proto_counts if proto_base is None else proto_base[1]
        if train and self.track_prototypes:
            protos, counts = update_task_prototypes(
                protos, counts, out.penultimate, labels, task, ctx.axis_name
            )
        sem = out.sem_logits[..., : ctx.n_cur]
        # fused upsample+CE kernels (ops/upsample_ce.py): every CE variant
        # below rides the ONE gate in _fused_gate — the full-res logits
        # never materialize when the head output is below label resolution.
        # Under GSPMD spatial partitioning (ctx.spatial_mesh) the same
        # kernels run shard_map'ped per space-shard with halo exchange.
        if use_weighted_ce and train:
            use_fused_ce, spatial = self._fused_gate(ctx, sem, labels)
            seen_prob = jax.lax.stop_gradient(
                ctx.seen_probs(params, bs, out.penultimate, protos)
            )
            if use_fused_ce and spatial is not None:
                from bacs_tpu.ops.upsample_ce import (
                    spatial_upsampled_bacs_weighted_ce,
                )

                loss = spatial_upsampled_bacs_weighted_ce(
                    sem,
                    labels,
                    jnp.max(seen_prob, axis=-1),
                    labels.shape[1:3],
                    spatial,
                    task.old_classes,
                    self.seen_gamma,
                    self.seen_threshold,
                    self.seen_ukd,
                    self.ignore_index,
                )
            elif use_fused_ce:
                # fused upsample + BACS weighted CE (ops/upsample_ce.py):
                # the full-res logits never materialize on this path either
                from bacs_tpu.ops.upsample_ce import (
                    upsampled_bacs_weighted_ce,
                )

                loss = upsampled_bacs_weighted_ce(
                    sem,
                    labels,
                    jnp.max(seen_prob, axis=-1),
                    labels.shape[1:3],
                    task.old_classes,
                    self.seen_gamma,
                    self.seen_threshold,
                    self.seen_ukd,
                    self.ignore_index,
                )
            else:
                loss = weighted_cross_entropy(
                    logits,
                    labels,
                    seen_prob,
                    old_classes=task.old_classes,
                    gamma=self.seen_gamma,
                    threshold=self.seen_threshold,
                    ukd=self.seen_ukd,
                    ignore_index=self.ignore_index,
                )
        else:
            loss = self.ce_with_upsample(ctx, sem, logits, labels,
                                         class_weights)

        # seen/fg detector training (reference: base_loss.py:192-199,241-250):
        # only on non-replay batches (unless same_task), gated on prototype
        # readiness, weighted by max(0, 1-exp(epoch - max_epochs)).
        if train and self.use_bg_detector and (same_task or not is_replay):
            # readiness checked on the post-fold counts (reference: the
            # in-place update precedes are_prototypes_ready, :219-222)
            ready = jnp.all(counts[: task.task_id + 1] > 0).astype(jnp.float32)
            # task_num may be a traced array (sampled replay partition) — only
            # treat a *static* -1 as "current task" (reference:
            # base_loss.py:264-266 `if task_num == -1: task_num = last`)
            if isinstance(task_num, int) and task_num == -1:
                t_num = task.task_id
            else:
                t_num = task_num
            seen_logits = ctx.seen_map_task(
                params,
                bs,
                out.penultimate,
                protos,  # post-fold, as in the reference (:245-250)
                t_num,
                stop_grads=not task.first_task,
            )
            fg_target = jnp.where(
                labels == self.ignore_index,
                self.ignore_index,
                (labels != 0).astype(jnp.int32),
            )
            seen_loss = binary_focal_loss(
                seen_logits[..., 0],
                fg_target,
                gamma=self.seen_gamma,
                alpha=self.seen_focal_alpha,
                ignore_index=self.ignore_index,
            )
            # skip batches with no background pixels (reference: 260-262)
            has_bg = jnp.any(labels == 0).astype(jnp.float32)
            weight = jnp.maximum(
                0.0,
                1.0
                - jnp.exp(state.epoch.astype(jnp.float32) - float(task.max_epochs)),
            )
            loss = loss + weight * ready * has_bg * seen_loss

        return loss, out, old_out, new_bs, seen_prob

    # ------------------------------------------------------------------
    # host-level task-boundary hooks
    # ------------------------------------------------------------------

    def begin_task(
        self, state: TrainState, ctx: ModelContext, data: Any
    ) -> TrainState:
        """Called before training task `ctx.task.task_id`
        (reference: loss_fn.on_train_start, learner/baselearner.py:80-96)."""
        return state

    def end_task(
        self, state: TrainState, ctx: ModelContext, data: Any
    ) -> TrainState:
        """Called after training a task; `data` iterates the task's train set
        (reference: loss_fn.on_train_end via learner teardown)."""
        if self.track_prototypes:
            state = self._sweep_prototypes(state, ctx, data)
        if self.needs_prev_model:
            state = state.replace(
                prev_params=jax.tree.map(jnp.copy, state.params),
                prev_batch_stats=jax.tree.map(jnp.copy, state.batch_stats),
            )
        return state

    def _sweep_prototypes(
        self, state: TrainState, ctx: ModelContext, data: Any
    ) -> TrainState:
        """If any active prototype is empty, sweep the loader once
        (reference: loss/prototypes.py:92-125)."""
        import numpy as np

        active = np.asarray(state.proto_counts[: ctx.task.task_id + 1])
        if (active > 0).all():
            return state

        # donated: avoids copying the full state (params + any buffer)
        # back out once per sweep batch
        @functools.partial(jax.jit, donate_argnums=(0,))
        def sweep_batch(state, image, labels):
            out, _ = ctx.forward(state.params, state.batch_stats, image, False)
            protos, counts = update_task_prototypes(
                state.prototypes,
                state.proto_counts,
                out.penultimate,
                labels,
                ctx.task,
            )
            return state.replace(prototypes=protos, proto_counts=counts)

        for batch in data:
            state = sweep_batch(state, batch["image"], batch["label"])
        return state
