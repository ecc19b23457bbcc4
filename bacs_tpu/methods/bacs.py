"""BACS: prototypes + seen-detector + dark experience replay, all on-device.

Redesign of the reference BACSLoss (reference: loss/bacs_loss.py), extending
ExperienceReplay with:

- DER (α term): MSE between buffered sem-logits and current sem-logits on
  replayed images, with per-sample logit "transplant" for channels beyond the
  class count stored with each slot, and the bg channel refreshed from the
  current model when `ignore_rep_bg` (reference: bacs_loss.py:387-431).
- dark++ (β term): weighted CE on a second replayed batch where only old
  classes carry weight (reference: bacs_loss.py:342-385).
- teacher feature distillation on background pixels gated by the seen
  detector (reference: bacs_loss.py:258-294).
- optional background pseudo-labeling from the frozen previous model
  (reference: bacs_loss.py:205-210).
- `end_task` populates the single reservoir with images, pre-upsample
  sem-logits (padded to the final class width), labels and −loss importance
  (reference: bacs_loss.py:133-203).

TPU-first: the buffer is HBM-resident; the two replay "dataloaders" of the
reference (CombinedLoader main/buffer/bufferlogits, bacs_loss.py:96-124)
become two independent in-graph samples per step — no host round-trip.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from bacs_tpu.methods.base import ModelContext, StepAux
from bacs_tpu.methods.er import ExperienceReplayMethod
from bacs_tpu.ops.interpolate import resize_bilinear
from bacs_tpu.ops.losses import cross_entropy
from bacs_tpu.train import buffer as buffer_lib
from bacs_tpu.train.state import TrainState

Array = jax.Array


def random_autocontrast(rng: Array, x: Array, p: float = 0.5) -> Array:
    """Batch-level RandomAutocontrast on float images
    (reference: bacs_loss.py:108-114 torchvision RandomAutocontrast(p=0.5)):
    per-channel min→0 / max→1 remap, applied with probability p."""
    lo = jnp.min(x, axis=(1, 2), keepdims=True)
    hi = jnp.max(x, axis=(1, 2), keepdims=True)
    stretched = (x - lo) / jnp.maximum(hi - lo, 1e-8)
    apply = jax.random.bernoulli(rng, p)
    return jnp.where(apply, stretched, x)


class BACSMethod(ExperienceReplayMethod):
    needs_prev_model = True
    needs_buffer = True

    def __init__(
        self,
        name: str = "BACS",
        alpha: float = 0.8,
        beta: float = 0.2,
        buffer_size: int = 50,
        replay_minibatch_size: int = 32,
        dark_plus_plus: bool = True,
        use_cosine_dist: bool = False,
        same_task: bool = False,
        ignore_rep_bg: bool = True,
        bg_weighted_ce: bool = False,
        seen_gamma: float = 2.0,
        seen_threshold: float = 0.5,
        seen_ukd: bool = True,
        seen_focal_alpha: Optional[float] = None,
        lkd: float = 0.25,
        lkd_alpha: float = 0.2,
        lkd_threshold: float = 0.5,
        pseudo_label: bool = False,
        mixup: bool = False,
        mixup_alpha: float = 1.0,
        mixup_threshold: int = 10,
        transplant_mode: str = "reference",
        merged_replay: bool = False,
        boundary_train_mode: bool = True,
        **kwargs,
    ):
        if transplant_mode not in ("reference", "per_sample"):
            raise ValueError(f"unknown transplant_mode {transplant_mode!r}")
        super().__init__(
            name=name,
            alpha=alpha,
            buffer_size=buffer_size,
            replay_minibatch_size=replay_minibatch_size,
            bg_weighted_ce=bg_weighted_ce,
            same_task=same_task,
            seen_gamma=seen_gamma,
            seen_threshold=seen_threshold,
            seen_ukd=seen_ukd,
            seen_focal_alpha=seen_focal_alpha,
            **kwargs,
        )
        self.beta = beta
        self.dark_plus_plus = dark_plus_plus
        self.use_cosine_dist = use_cosine_dist
        self.ignore_rep_bg = ignore_rep_bg
        self.lkd = lkd
        self.lkd_alpha = lkd_alpha
        self.lkd_threshold = lkd_threshold
        # pseudo-labeling only when weighted CE is off (reference: :60-61)
        self.pseudo_label = pseudo_label and not bg_weighted_ce
        self.mixup = mixup
        self.mixup_alpha = mixup_alpha
        self.mixup_threshold = mixup_threshold
        self.transplant_mode = transplant_mode
        self.merged_replay = merged_replay
        # True (default) = reference parity: the buffer-population pass runs
        # the model in TRAIN mode, so BN running stats DRIFT at every task
        # boundary (doubled along the penultimate path by the detector
        # probe, bacs_loss.py:191).  At small batch/crop the drift is
        # measurably harmful — ADE-width 100-50 at batch 8 × 64²: final
        # test mIoU 0.086 vs 0.234 prev-val right before the boundary
        # (docs/RESULTS.md round 4).  `boundary_train_mode=false` opts into
        # eval-mode population: no stat drift; stored logits/importance use
        # running stats instead of batch stats (same shapes and ordering
        # rules, slightly different values — a deliberate divergence).
        self.boundary_train_mode = boundary_train_mode

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
        task = ctx.task
        image, mask = batch["image"], batch["label"]
        use_der = task.task_id > 0
        rng, r_main, r_replay = jax.random.split(rng, 3)

        if train and self.pseudo_label and state.prev_params is not None:
            prev_out = ctx.forward_prev(state, image)
            pseudo = jnp.argmax(
                prev_out.logits[..., : task.old_classes], axis=-1
            ).astype(mask.dtype)
            mask = jnp.where(mask == 0, pseudo, mask)

        need_distill = use_der and train and self.lkd > 0
        loss, out, old_out, new_bs, seen_prob = self.compute_base_loss(
            ctx, params, state, image, mask, train, r_main,
            use_weighted_ce=self.bg_weighted_ce and use_der,
            need_old_out=need_distill,
        )
        if need_distill and old_out is not None:
            loss = loss + self._teacher_distill(
                old_out.attentions[-1], out.attentions[-1], seen_prob, mask
            )

        updates = self.prototype_updates(ctx, state, out.penultimate, mask, train)

        if train and use_der and state.buffer is not None and (
            self.alpha > 0 or self.beta > 0
        ):
            replay_loss, new_bs, rep_updates = self._replay_der_loss(
                ctx, params, state, new_bs, r_replay, updates
            )
            loss = loss + replay_loss
            updates = rep_updates

        return loss, StepAux(
            logits=out.logits[..., : ctx.n_cur],
            batch_stats=new_bs,
            state_updates=updates,
            metrics={},
            sem_logits=out.sem_logits[..., : ctx.n_cur],
        )

    # ------------------------------------------------------------------

    def _teacher_distill(self, old_att, new_att, seen_prob, mask):
        """(reference: bacs_loss.py:258-294 `_teacher_distill`).

        Embeddings (last attention = ASPP output) are bilinearly upsampled to
        label size, zeroed outside the gated-background mask, squared; the
        loss is the mean frobenius norm over the width axis of the
        difference, scaled by lkd.
        """
        if self.lkd == 0:
            return 0.0
        mask_fg_bg = mask == 0
        if seen_prob is not None:
            mask_fg_bg = mask_fg_bg & (
                jnp.max(seen_prob, axis=-1) > self.lkd_threshold
            )

        def _norm(emb):
            emb = resize_bilinear(
                emb.astype(jnp.float32), mask.shape[1:3], align_corners=False
            )
            emb = jnp.where(mask_fg_bg[..., None], emb, 0.0)
            return jnp.square(emb)

        diff = _norm(old_att) - _norm(new_att)
        # torch frobenius_norm(dim=-1) on NCHW = norm over the width axis.
        # eps guard: fully-masked rows are exactly zero and JAX's norm grad
        # is NaN at zero (torch special-cases it)
        return self.lkd * jnp.mean(
            jnp.sqrt(jnp.sum(jnp.square(diff), axis=2) + 1e-12)
        )

    # ------------------------------------------------------------------

    def _dark_logits(self, ctx, params, state, batch_stats, rng):
        """α term (reference: bacs_loss.py:387-431)."""
        r_sample, r_aug, r_fwd = jax.random.split(rng, 3)
        mem = buffer_lib.sample(
            state.buffer, r_sample, self.replay_minibatch_size
        )
        inputs = random_autocontrast(r_aug, mem["images"])
        out, new_bs = ctx.forward(params, batch_stats, inputs, True, r_fwd)
        sem = out.sem_logits[..., : ctx.n_cur]
        dark = self._dark_from_sem(ctx, sem, mem)
        return dark, new_bs, mem

    def _dark_from_sem(self, ctx, sem, mem):
        """The α-term math given the replay batch's sem logits (shared by
        the two-forward parity path and the merged-forward variant)."""
        mem_logits = mem["logits"][..., : ctx.n_cur]
        transplant = jax.lax.stop_gradient(sem)
        if self.transplant_mode == "per_sample":
            # intended semantics (the reference code's own comment:
            # "Transplant logits in a good way"): every sample's channels
            # >= its stored class count come from the current model
            ch = jnp.arange(ctx.n_cur)[None, None, None, :]
            grow_mask = ch >= mem["n_classes"][:, None, None, None]
        else:
            # "reference" (default): mirror the reference's indexing quirk
            # (bacs_loss.py:418-427) — the loop reads
            # `indices = returned_indices[indx]`, the unique-INVERSE value at
            # position indx, so per unique class-count at most one batch item
            # gets the grown channels transplanted; the rest keep their
            # stored (zero-padded) values.  The published BACS numbers were
            # produced with this behavior, so it is the parity default.
            n_cls = mem["n_classes"]
            bsz = n_cls.shape[0]
            fill = jnp.iinfo(jnp.int32).max
            u, inv = jnp.unique(
                n_cls, size=bsz, fill_value=fill, return_inverse=True
            )
            n_u = jnp.sum(u != fill)
            idxs = jnp.arange(bsz)
            ok = (idxs < n_u) & (u < ctx.n_cur)  # loop guard + n<C check
            item_of = inv[idxs]  # the reference's returned_indices[indx]
            cmask = (
                jnp.arange(ctx.n_cur)[None, :] >= u[:, None]
            ) & ok[:, None]  # [indx, C]
            sel = item_of[:, None] == idxs[None, :]  # [indx, item]
            grow_mask = (
                jnp.einsum("ib,ic->bc", sel.astype(jnp.float32),
                           cmask.astype(jnp.float32)) > 0
            )[:, None, None, :]
        mem_logits = jnp.where(grow_mask, transplant, mem_logits)
        if self.ignore_rep_bg:
            mem_logits = mem_logits.at[..., 0].set(transplant[..., 0])
        if self.use_cosine_dist:
            a = mem_logits.reshape(mem_logits.shape[0], -1)
            b = sem.reshape(sem.shape[0], -1)
            cos = jnp.sum(a * b, -1) / (
                jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1) + 1e-8
            )
            return jnp.mean(1.0 - cos)
        return jnp.mean(jnp.square(mem_logits - sem))

    def _old_class_weights(self, ctx):
        """β-term class weights: 1 for old foreground classes, bg excluded
        when ignore_rep_bg (reference: bacs_loss.py:342-360). Shared by the
        two-forward parity path and the merged-replay path."""
        cls_idx = jnp.arange(ctx.n_cur)
        start = 1 if self.ignore_rep_bg else 0
        return (
            (cls_idx >= start) & (cls_idx < ctx.task.old_classes)
        ).astype(jnp.float32)

    def _dark_pp(self, ctx, params, state, batch_stats, rng, updates):
        """β term (reference: bacs_loss.py:342-385)."""
        if not self.dark_plus_plus:
            return 0.0, batch_stats, updates
        r_sample, r_fwd, r_mix = jax.random.split(rng, 3)
        mem = buffer_lib.sample(
            state.buffer, r_sample, self.replay_minibatch_size
        )
        weights = self._old_class_weights(ctx)
        if self.mixup:
            return self._dark_pp_mixup(
                ctx, params, state, batch_stats, r_fwd, r_mix, mem, weights,
                updates,
            )
        # canonical buffered samples get the train augmentation at every
        # replay (reference: base_datamodule.py:433-451 get_buffer_loader)
        from bacs_tpu.data.transforms import replay_augment

        r_fwd, r_aug = jax.random.split(r_fwd)
        images, labels = replay_augment(r_aug, mem["images"], mem["labels"])
        loss, rep_out, _, new_bs, _ = self.compute_base_loss(
            ctx, params, state, images, labels, True, r_fwd,
            class_weights=weights,
            is_replay=True,
            batch_stats=batch_stats,
            # replay folds on top of the main batch's prototype update
            # (reference updates in place, base_loss.py:219-220)
            proto_base=(
                updates.get("prototypes", state.prototypes),
                updates.get("proto_counts", state.proto_counts),
            ),
        )
        # replay batches also fold into the prototypes
        # (reference: base_loss.py:219-220 runs for every compute_base_loss)
        updates = self.prototype_updates(
            ctx, state, rep_out.penultimate, labels, True, base=updates
        )
        return loss, new_bs, updates

    def _dark_pp_mixup(
        self, ctx, params, state, batch_stats, r_fwd, r_mix, mem, weights,
        updates,
    ):
        """Co-occurrence mixup replay (reference: buffer.py:275-303
        `_co_occurance_image_blend` + bacs_loss.py:361-374 lamdas path).

        Partner selection maximizes the pairwise class co-occurrence score
        (derived from the buffer's label bitmasks instead of a stored map);
        λ = 0.9 when the merged class count exceeds the threshold, else
        Beta(α, α); the blended image keeps the reference's literal
        `λ·a + λ·b` formula.
        """
        from bacs_tpu.ops.losses import cross_entropy

        buf = state.buffer
        valid = buf.valid[:, None]
        # exclude bg AND the trailing ignore-label column (the reference's
        # co-occurrence blend filters both 0 and 255, buffer.py:276-278)
        fg_mask = buf.label_mask.at[:, 0].set(False).at[:, -1].set(False)
        co = jnp.einsum(
            "ic,jd->cd",
            (fg_mask & valid).astype(jnp.float32),
            (fg_mask & valid).astype(jnp.float32),
        )
        sets = fg_mask[mem["indices"]].astype(jnp.float32)  # [B, C]
        sim = jnp.einsum("ic,cd,jd->ij", sets, co, sets)
        b = sets.shape[0]
        sim = jnp.where(jnp.eye(b, dtype=bool), -jnp.inf, sim)
        partner = jnp.argmax(sim, axis=1)
        n_merged = jnp.sum(sets, axis=1) + jnp.sum(sets[partner], axis=1)
        beta = jax.random.beta(r_mix, self.mixup_alpha, self.mixup_alpha, (b,))
        lam = jnp.where(n_merged > self.mixup_threshold, 0.9, beta)
        lam4 = lam[:, None, None, None]
        mixed = lam4 * mem["images"] + lam4 * mem["images"][partner]
        out, new_bs = ctx.forward(params, batch_stats, mixed, True, r_fwd)
        logits = out.logits[..., : ctx.n_cur]
        ce_a = cross_entropy(
            logits, mem["labels"], self.ignore_index, class_weights=weights,
            reduction="none",
        )
        ce_b = cross_entropy(
            logits, mem["labels"][partner], self.ignore_index,
            class_weights=weights, reduction="none",
        )
        loss = jnp.mean(lam[:, None, None] * ce_a + (1 - lam)[:, None, None] * ce_b)
        return loss, new_bs, updates

    def _merged_replay_der_loss(self, ctx, params, state, batch_stats, rng,
                                updates):
        """α+β replay in ONE concatenated forward (loss.merged_replay).

        Halves the replay leg's BN-stats passes and kernel dispatches by
        batching the dark-logits and dark++ samples through a single 2B
        forward.  DEVIATION from the reference's two-loader semantics: BN
        batch statistics are computed over the merged batch, so train-mode
        activations differ slightly from the two-forward parity path —
        off by default; measured in scripts/bench_bacs_step.py --merged."""
        from bacs_tpu.data.transforms import replay_augment

        r_alpha, r_beta = jax.random.split(rng)
        rs_a, r_aug_a, r_fwd = jax.random.split(r_alpha, 3)
        mem_dl = buffer_lib.sample(
            state.buffer, rs_a, self.replay_minibatch_size
        )
        inputs_dl = random_autocontrast(r_aug_a, mem_dl["images"])
        rs_b, r_aug_b = jax.random.split(r_beta)
        mem_pp = buffer_lib.sample(
            state.buffer, rs_b, self.replay_minibatch_size
        )
        imgs_pp, labs_pp = replay_augment(
            r_aug_b, mem_pp["images"], mem_pp["labels"]
        )
        nb = inputs_dl.shape[0]
        big = jnp.concatenate(
            [inputs_dl, imgs_pp.astype(inputs_dl.dtype)], axis=0
        )
        out, new_bs = ctx.forward(params, batch_stats, big, True, r_fwd)
        sem = out.sem_logits[..., : ctx.n_cur]
        dark = self._dark_from_sem(ctx, sem[:nb], mem_dl)

        weights = self._old_class_weights(ctx)
        sem_pp = sem[nb:]
        # β CE rides the SAME fused-kernel gate as the parity path
        # (BaseLoss._fused_gate / ce_with_upsample — incl. the spatial
        # shard_map wrappers and their shape-divisibility fallback)
        pp = self.ce_with_upsample(
            ctx, sem_pp, out.logits[nb:, ..., : ctx.n_cur], labs_pp, weights
        )
        # pp samples fold into the prototypes like the two-forward path
        # (base_loss.py:219-220); the dark-logits forward never does
        updates = self.prototype_updates(
            ctx, state, out.penultimate[nb:], labs_pp, True, base=updates
        )
        return self.alpha * dark + self.beta * pp, new_bs, updates

    def _replay_der_loss(self, ctx, params, state, batch_stats, rng, updates):
        """(reference: bacs_loss.py:433-463)."""
        if (
            self.merged_replay
            and self.alpha != 0
            and self.beta != 0
            and self.dark_plus_plus
            and not self.mixup
        ):
            return self._merged_replay_der_loss(
                ctx, params, state, batch_stats, rng, updates
            )
        r_alpha, r_beta = jax.random.split(rng)
        total = 0.0
        if self.alpha != 0:
            dark, batch_stats, _ = self._dark_logits(
                ctx, params, state, batch_stats, r_alpha
            )
            total = total + self.alpha * dark
        if self.beta != 0:
            pp, batch_stats, updates = self._dark_pp(
                ctx, params, state, batch_stats, r_beta, updates
            )
            total = total + self.beta * pp
        return total, batch_stats, updates

    # ------------------------------------------------------------------

    def end_task(self, state: TrainState, ctx: ModelContext, data: Any):
        """Populate the single reservoir with this task's data
        (reference: bacs_loss.py:133-203 `on_train_end`).

        Order mirrors the reference exactly: prototype sweep first
        (BaseLoss.on_train_end → _prototypes.on_train_end, base_loss.py:
        135,162-165), then the prev-model snapshot (bacs_loss.py:144-146 —
        BEFORE population), then the buffer fill.  Population runs the model
        in TRAIN mode — at PL teardown the module is back in train mode, so
        the reference's stored logits/losses use batch statistics and the
        live model's running stats DRIFT during population while the
        already-cloned prev model keeps the pre-drift stats."""
        task = ctx.task
        if self.track_prototypes:
            state = self._sweep_prototypes(state, ctx, data)
        state = state.replace(
            prev_params=jax.tree.map(jnp.copy, state.params),
            prev_batch_stats=jax.tree.map(jnp.copy, state.batch_stats),
        )
        if state.buffer is None or not (self.alpha > 0 or self.beta > 0):
            return state

        # donated: the buffer scatter must be in-place at production buffer
        # sizes (see er.py populate)
        train_mode = self.boundary_train_mode

        @functools.partial(jax.jit, donate_argnums=(0,))
        def populate(state, rng, image, labels):
            r1, r2, r_buf = jax.random.split(rng, 3)
            out, new_bs = ctx.forward(
                state.params, state.batch_stats, image, train_mode, r1
            )
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
            if self.use_bg_detector and train_mode:
                # the reference's seen-detector probe is a SECOND train-mode
                # pass through the model's penultimate path per batch
                # (_get_seen_detector → get_penultimate_output,
                # bacs_loss.py:191): those norms update twice per population
                # batch.  Our single full forward already updated every
                # subtree once; take the penultimate-path subtrees from a
                # second forward to mirror the double update.  The path is
                # model-specific (DeepLab/TranSeg: backbone; UNet: encoder)
                # and declared by each network as `penultimate_stats_keys`
                # — missing keys fail loudly rather than silently skipping
                # the drift.  (The stored seen maps themselves are dead
                # weight in the reference — the replay loaders never read
                # them — so we don't store them.)
                _, bs2 = ctx.forward(state.params, new_bs, image, True, r2)
                keys = ctx.model.penultimate_stats_keys
                missing = [k for k in keys if k not in bs2]
                assert not missing, (
                    f"{type(ctx.model).__name__}.penultimate_stats_keys "
                    f"{missing} absent from batch_stats {list(bs2)}"
                )
                new_bs = dict(new_bs)
                for k in keys:
                    new_bs[k] = bs2[k]
            buf = buffer_lib.add_batch(
                state.buffer, r_buf, image, sem, labels, losses,
                task_id=task.task_id, n_classes=ctx.n_cur,
                ignore_index=self.ignore_index,
            )
            return state.replace(buffer=buf, batch_stats=new_bs)

        rng = jax.random.PRNGKey(4321 + task.task_id)
        for batch in data:
            rng, sub = jax.random.split(rng)
            state = populate(state, sub, batch["image"], batch["label"])
        return state
