"""Experience Replay baseline with the HBM reservoir buffer.

Redesign of the reference ExperienceReplay (reference: loss/experience_replay.py):
- `end_task` populates the buffer with images/labels/−CE importance scores via
  a jitted pass over the task loader (reference: er.py:112-151).
- During tasks > 0, each train step adds α · weighted-CE on a replayed batch
  where only old-class pixels carry weight (reference: er.py:244-272).
- `same_task=True` keeps one buffer partition per task and picks the replay
  task by softmax over per-partition median importance
  (reference: er.py:77-97 `_get_random_buffer`); `same_task=False` keeps one
  flat buffer.

Buffer slots are preallocated at `n_partitions × buffer_size`; partition p of
a same-task buffer occupies slots [p·size, (p+1)·size).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from bacs_tpu.methods.base import Method, ModelContext, StepAux
from bacs_tpu.ops.losses import cross_entropy
from bacs_tpu.train import buffer as buffer_lib
from bacs_tpu.train.state import TrainState


class ExperienceReplayMethod(Method):
    needs_buffer = True

    def __init__(
        self,
        name: str = "Experience Replay",
        alpha: float = 1.0,
        buffer_size: int = 50,
        replay_minibatch_size: int = 32,
        bg_weighted_ce: bool = False,
        same_task: bool = True,
        buffer_dtype: str = "bfloat16",
        buffer_image_dtype: str | None = None,
        **kwargs,
    ):
        super().__init__(name=name, **kwargs)
        self.alpha = alpha
        self.buffer_size = buffer_size
        self.replay_minibatch_size = replay_minibatch_size
        self.bg_weighted_ce = bg_weighted_ce
        self.same_task = same_task
        # HBM storage dtype for buffered images/logits.  bf16 halves the
        # buffer's HBM footprint (the reference memmaps f32 on DISK,
        # buffer.py:23-29 — an HBM-resident buffer makes the trade
        # explicit); "float32" restores bit-exact replay targets
        # (tests/test_boundary_parity.py pins semantics at f32).
        # `buffer_image_dtype=uint8` stores images as raw pixels —
        # LOSSLESS for canonical buffer images (they originate as uint8;
        # buffer_lib._encode_image) and half of bf16's bytes; logits keep
        # `buffer_dtype` (real-valued DER targets).
        self.buffer_dtype = jnp.dtype(buffer_dtype)
        self.buffer_image_dtype = jnp.dtype(
            buffer_image_dtype if buffer_image_dtype else buffer_dtype
        )

    # ------------------------------------------------------------------

    def init_buffer(
        self, task: Any, image_hw: Tuple[int, int], logit_hw: Tuple[int, int]
    ):
        n_slots = (
            self.buffer_size * task.n_tasks if self.same_task else self.buffer_size
        )
        return buffer_lib.init_buffer(
            n_slots, image_hw, logit_hw, task.num_classes,
            image_dtype=self.buffer_image_dtype,
            logit_dtype=self.buffer_dtype,
        )

    def _partition(self, task_id: int) -> Optional[Tuple[int, int]]:
        if not self.same_task:
            return None
        return task_id * self.buffer_size, self.buffer_size

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
        use_er = task.task_id > 0
        rng, r_sample = jax.random.split(rng)
        loss, out, _, new_bs, _ = self.compute_base_loss(
            ctx, params, state, image, mask, train, rng,
            use_weighted_ce=self.bg_weighted_ce and use_er and train,
            same_task=self.same_task,
        )
        updates = self.prototype_updates(ctx, state, out.penultimate, mask, train)
        if train and use_er and state.buffer is not None:
            replay_loss, new_bs = self._replay_er_loss(
                ctx, params, state, new_bs, r_sample
            )
            # α is applied TWICE in the reference — once inside
            # _replay_er_loss (er.py:298) and once at the call site
            # (er.py:181).  Deliberate quirk preservation; every shipped
            # config keeps the ER alpha at its default 1.0.
            loss = loss + self.alpha * self.alpha * replay_loss
        return loss, StepAux(
            logits=out.logits[..., : ctx.n_cur],
            batch_stats=new_bs,
            state_updates=updates,
            metrics={},
            sem_logits=out.sem_logits[..., : ctx.n_cur],
        )

    def _sample_replay(self, state: TrainState, rng: jax.Array, task_id: int):
        """Pick a previous-task partition by median-importance softmax, then
        sample within it (reference: er.py:77-97,305-344)."""
        buf = state.buffer
        if self.same_task:
            r_task, r_batch = jax.random.split(rng)
            n_prev = max(task_id, 1)
            size = self.buffer_size
            imp = buf.importance[: n_prev * size].reshape(n_prev, size)
            valid = buf.valid[: n_prev * size].reshape(n_prev, size)
            # median of −importance over set slots per partition
            neg = jnp.where(valid, -imp, jnp.nan)
            med = jnp.nanmedian(neg, axis=1)
            med = jnp.where(jnp.isnan(med), 10.0, med)  # get_importance default
            if task_id > 1:
                scores = jax.nn.softmax(med / jnp.maximum(jnp.max(med), 1e-8))
                part = jax.random.choice(r_task, n_prev, p=scores)
            else:
                part = jnp.zeros((), jnp.int32)
            sample = buffer_lib.sample(
                buf, r_batch, self.replay_minibatch_size, task_id=part
            )
            sample["task_id"] = part
            return sample
        sample = buffer_lib.sample(buf, rng, self.replay_minibatch_size)
        sample["task_id"] = jnp.asarray(-1, jnp.int32)
        return sample

    def _replay_er_loss(self, ctx, params, state, batch_stats, rng):
        """Weighted CE on a replayed batch: only old-class pixels weighted
        (reference: er.py:244-272)."""
        task = ctx.task
        mem = self._sample_replay(state, rng, task.task_id)
        # class weights: 1 for classes [1, old_classes) — for same_task
        # replay, "old" is relative to the sampled task's end
        # (reference: er.py:255-260)
        cls_idx = jnp.arange(task.nb_current_classes)
        if self.same_task:
            end = task.initial_classes + task.increment * mem["task_id"]
            weights = ((cls_idx >= 1) & (cls_idx < end)).astype(jnp.float32)
        else:
            weights = (
                (cls_idx >= 1) & (cls_idx < task.old_classes)
            ).astype(jnp.float32)
        rng, r_fwd, r_aug = jax.random.split(rng, 3)
        # buffered samples are canonical; re-apply the train augmentation at
        # every replay (reference: base_datamodule.py:433-451)
        from bacs_tpu.data.transforms import replay_augment

        images, labels = replay_augment(r_aug, mem["images"], mem["labels"])
        # same_task replay trains the seen-detector on the SAMPLED task's head
        # (reference: loss/experience_replay.py:244-272 passes
        # memory_dict["task_id"] as task_num); non-same-task replay never
        # reaches the detector branch (gated by `same_task or not is_replay`).
        replay_task = mem["task_id"] if self.same_task else -1
        loss, _, _, new_bs, _ = self.compute_base_loss(
            ctx, params, state, images, labels, True, r_fwd,
            task_num=replay_task,
            class_weights=weights,
            is_replay=True,
            same_task=self.same_task,
            batch_stats=batch_stats,
        )
        return loss, new_bs

    # ------------------------------------------------------------------

    def end_task(self, state: TrainState, ctx: ModelContext, data: Any):
        """Populate the buffer with this task's data + importance scores
        (reference: er.py:112-151)."""
        task = ctx.task
        if state.buffer is None:
            return super().end_task(state, ctx, data)
        part = self._partition(task.task_id)

        # donate state: without it every population batch round-trips the
        # full buffer (and params) through HBM — ~0.8 GB/batch at
        # buffer 300 × 512² (the scatter is in-place only under donation)
        @functools.partial(jax.jit, donate_argnums=(0,))
        def populate(state, rng, image, labels):
            out, _ = ctx.forward(state.params, state.batch_stats, image, False)
            logits = out.logits[..., : ctx.n_cur]
            w = jnp.ones((ctx.n_cur,), jnp.float32).at[0].set(0.0)
            nll = cross_entropy(
                logits, labels, self.ignore_index, class_weights=w,
                reduction="none",
            )
            losses = -jnp.mean(nll.reshape(image.shape[0], -1), axis=1)
            sem = out.sem_logits[..., : ctx.n_cur]
            pad = task.num_classes - ctx.n_cur
            sem = jnp.pad(sem, ((0, 0), (0, 0), (0, 0), (0, pad)))
            buf = self._buffer_add(
                state.buffer, rng, image, sem, labels, losses, task, part
            )
            return state.replace(buffer=buf)

        if part is not None:
            # fresh per-partition reservoir bookkeeping (reference: each task
            # gets a brand-new Buffer object, er.py:36-56)
            state = state.replace(
                buffer=state.buffer.replace(
                    num_seen=jnp.zeros((), jnp.int32),
                    class_counts=jnp.zeros_like(state.buffer.class_counts),
                )
            )
        seen = 0
        rng = jax.random.PRNGKey(1234 + task.task_id)
        for batch in data:
            rng, sub = jax.random.split(rng)
            state = populate(state, sub, batch["image"], batch["label"])
            seen += batch["image"].shape[0]
            if seen >= self.buffer_size:  # (reference: er.py:149-150)
                break
        return super().end_task(state, ctx, data)

    def _buffer_add(self, buf, rng, image, sem, labels, losses, task, part):
        if part is None:
            return buffer_lib.add_batch(
                buf, rng, image, sem, labels, losses,
                task_id=task.task_id, n_classes=task.nb_current_classes,
                ignore_index=self.ignore_index,
            )
        offset, size = part
        # reservoir within this task's partition: operate on the slice.
        # A partition is only ever written while its own task ends (each
        # reference per-task Buffer is fresh, er.py:36-56), so per-partition
        # num_seen/class_counts ride the global scalars, reset by end_task.
        slot_fields = ("images", "logits", "labels", "importance",
                       "label_mask", "task_ids", "n_classes", "valid")
        sub = buf.replace(
            **{f: getattr(buf, f)[offset : offset + size] for f in slot_fields}
        )
        sub = buffer_lib.add_batch(
            sub, rng, image, sem, labels, losses,
            task_id=task.task_id, n_classes=task.nb_current_classes,
            ignore_index=self.ignore_index,
        )
        return buf.replace(
            num_seen=sub.num_seen,
            class_counts=sub.class_counts,
            **{
                f: getattr(buf, f)
                .at[offset : offset + size]
                .set(getattr(sub, f))
                for f in slot_fields
            },
        )
