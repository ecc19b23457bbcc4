"""SDR: prototype matching, contrastive separation, sparsity, distillation.

Redesign of the reference SDR loss (reference: loss/sdr.py), vectorized for
XLA — the reference's data-dependent per-class python loops become static
loops over the (compile-time) class count with presence masks:

- per-CLASS running-mean prototypes (reference: sdr.py:79-158), stored in
  `state.class_prototypes` / `class_proto_counts`
- feature clustering toward prototypes + inverse-pairwise-distance
  separation (reference: sdr.py:160-207), including the reference's literal
  "divide the accumulator every present class" recurrence
- feature sparsification (reference: sdr.py:209-242)
- prototype distillation on prev-model pseudo-labeled bg (sdr.py:244-280)
- UKD × loss_kd (reference: sdr.py:318)

Objective: task 0 plain CE (mean over valid), task > 0 unbiased CE (mean).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from bacs_tpu.methods.base import Method, ModelContext, StepAux
from bacs_tpu.ops.interpolate import resize_nearest
from bacs_tpu.train.state import TrainState

Array = jax.Array
EPS = 1e-15


class SDRMethod(Method):
    needs_prev_model = True
    needs_class_prototypes = True

    def __init__(
        self,
        name: str = "SDR",
        lfc_sep_clust: float = 1e-3,
        loss_fc: float = 1e-3,
        loss_featspars: float = 1e-3,
        loss_de_prototypes: float = 0.01,
        loss_kd: float = 100.0,
        sequential_mode: bool = False,
        **kwargs,
    ):
        super().__init__(name=name, **kwargs)
        self.lfc_sep_clust = lfc_sep_clust
        self.loss_fc = loss_fc
        self.loss_featspars = loss_featspars
        self.loss_de_prototypes = loss_de_prototypes
        self.loss_kd = loss_kd
        self.sequential_mode = sequential_mode

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
        out, new_bs = ctx.forward(params, state.batch_stats, image, train, rng)
        logits = out.logits[..., : ctx.n_cur]
        sem = out.sem_logits[..., : ctx.n_cur]
        # both CE variants ride the fused upsample+CE gate (full-res logits
        # only exist on the composed fallback path)
        if task.task_id > 0:
            loss = self.uce_with_upsample(
                ctx, sem, logits, mask, task.old_classes
            )
        else:
            loss = self.ce_with_upsample(ctx, sem, logits, mask)

        updates: Dict[str, Any] = {}
        use_distill = train and task.task_id > 0 and state.prev_params is not None
        if use_distill:
            feats = out.penultimate
            protos, counts = self._update_class_prototypes(
                state, feats, mask, task, ctx.axis_name
            )
            updates["class_prototypes"] = protos
            updates["class_proto_counts"] = counts
            loss = loss + self._feature_sparsification(mask, feats, task)
            loss = loss + self._clustering_separation(mask, feats, protos, task)
            old_out = ctx.forward_prev(state, image)
            loss = loss + self._proto_distillation(
                ctx, old_out, feats, mask, protos, task
            )
            loss = loss + self.loss_kd * self.ukd_with_upsample(
                ctx, out, old_out, mask
            )

        return loss, StepAux(
            logits=logits, batch_stats=new_bs, state_updates=updates, metrics={},
            sem_logits=out.sem_logits[..., : ctx.n_cur],
        )

    # ------------------------------------------------------------------

    def _class_masks(self, mask, hw, task):
        """[N,h,w] downsampled labels + per-class one-hot [N,h,w,C]."""
        labels_down = resize_nearest(mask, hw)
        valid = labels_down != task.ignore_index
        safe = jnp.where(valid, labels_down, 0)
        onehot = (
            jax.nn.one_hot(safe, task.nb_current_classes) * valid[..., None]
        )
        return labels_down, onehot

    def _update_class_prototypes(self, state, feats, mask, task, axis_name):
        """(reference: sdr.py:121-158 — skip bg when not sequential mode).

        Intentional deviation: the reference's
        `features[mask.expand(...)].view(D, -1)` scrambles feature
        dimensions whenever a class appears in more than one image of the
        batch (the boolean-select flattens batch-major, the view rechunks
        dim-major), so its running means mix dimensions in that case.  We
        compute the true per-class mean; tests/test_method_parity.py pins
        equality on the well-defined single-image case.
        """
        feats = jax.lax.stop_gradient(feats.astype(jnp.float32))
        _, onehot = self._class_masks(mask, feats.shape[1:3], task)
        if not self.sequential_mode and task.task_id > 0:
            onehot = onehot.at[..., 0].set(0.0)
        sums = jnp.einsum("nhwc,nhwd->cd", onehot, feats)
        n = jnp.sum(onehot, axis=(0, 1, 2))
        if axis_name is not None:
            sums, n = jax.lax.psum((sums, n), axis_name)
        c_total = task.num_classes
        sums = jnp.pad(sums, ((0, c_total - sums.shape[0]), (0, 0)))
        n = jnp.pad(n, (0, c_total - n.shape[0]))
        counts = state.class_proto_counts
        protos = state.class_prototypes
        new_counts = counts + n
        new_protos = jnp.where(
            (n > 0)[:, None],
            (sums + counts[:, None] * protos)
            / jnp.maximum(new_counts, 1.0)[:, None],
            protos,
        )
        return new_protos, new_counts

    def _clustering_separation(self, mask, feats, protos, task):
        """(reference: sdr.py:160-207)."""
        c_cur = task.nb_current_classes
        f = feats.astype(jnp.float32)
        _, onehot = self._class_masks(mask, f.shape[1:3], task)
        n_pix = jnp.sum(onehot, axis=(0, 1, 2))  # [C]
        present = n_pix > 0
        d = f.shape[-1]
        # per-class MSE(features_cl, prototype[cl]): mean over pixels & dims
        sums = jnp.einsum("nhwc,nhwd->cd", onehot, f)
        sq_sums = jnp.einsum("nhwc,nhwd->cd", onehot, jnp.square(f))
        p = protos[:c_cur]
        # E[(x - p)^2] = E[x^2] - 2 p E[x] + p^2 per dim, mean over dims
        denom = jnp.maximum(n_pix, 1.0)[:, None]
        mse_c = jnp.mean(
            sq_sums / denom - 2 * p * (sums / denom) + jnp.square(p), axis=1
        )
        mse_c = jnp.where(present, mse_c, 0.0)
        # the reference's accumulate-then-divide recurrence over present
        # classes, replicated with a static scan (sdr.py:180-186)
        n_present = jnp.maximum(jnp.sum(present), 1)

        def body(acc, x):
            m, pres = x
            acc = jnp.where(pres, (acc + m) / n_present, acc)
            return acc, None

        cluster_loss, _ = jax.lax.scan(body, 0.0, (mse_c, present))
        cluster_loss = self.loss_fc * cluster_loss

        # separation: inverse pairwise distances among present class means
        means = sums / denom  # [C, D]
        diff = means[:, None, :] - means[None, :, :]
        dist = jnp.sqrt(jnp.sum(jnp.square(diff), -1) + 1e-12)
        pair_ok = present[:, None] & present[None, :] & ~jnp.eye(c_cur, dtype=bool)
        inv = jnp.where(pair_ok, 1.0 / jnp.maximum(dist, 1e-12), 0.0)
        n_pairs = jnp.sum(pair_ok)
        sep = jnp.where(n_pairs > 0, jnp.sum(inv) / jnp.maximum(n_pairs, 1), 0.0)
        return cluster_loss + self.lfc_sep_clust * sep

    def _feature_sparsification(self, mask, feats, task):
        """(reference: sdr.py:209-242).

        Reference semantics, quirks included: pixels are grouped by the RAW
        downsampled label — `torch.unique` keeps the ignore index, so 255
        pixels form their own normalization group and are NOT excluded —
        and each group is normalized by its global (pixels x channels) max.
        Background is dropped only when it is the sole label present
        (`classes[-1] == 0` can only hold then), which zeroes the loss.
        Zeroing any covered pixel instead would blow up shrink/summed to
        exp(0)·D/eps — the reference never zeroes covered pixels.
        """
        f = feats.astype(jnp.float32)
        labels_down, _ = self._class_masks(mask, f.shape[1:3], task)
        c_cur = task.nb_current_classes
        # group ids: 0..C-1 = classes, C = ignore_index pixels
        grp = jnp.where(labels_down == task.ignore_index, c_cur, labels_down)
        pix_max = jnp.max(f, axis=-1)  # max over channels per pixel
        per_grp_max = (
            jnp.full((c_cur + 1,), -jnp.inf)
            .at[grp.reshape(-1)]
            .max(pix_max.reshape(-1))
        )  # every pixel's own group is present, so no -inf is ever read
        features_norm = f / (per_grp_max[grp][..., None] + EPS)
        only_bg = jnp.all(grp == 0)  # loop skipped -> features_norm stays 0
        features_norm = jnp.where(only_bg, 0.0, features_norm)
        total = jnp.sum(features_norm)
        shrink = jnp.sum(jnp.exp(features_norm), axis=-1, keepdims=True)
        summed = jnp.sum(features_norm, axis=-1, keepdims=True)
        ratio = jnp.mean(shrink / (summed + EPS))
        return self.loss_featspars * jnp.where(total > 0, ratio, 0.0)

    def _proto_distillation(self, ctx, old_out, feats, mask, protos, task):
        """(reference: sdr.py:244-280)."""
        f = jnp.asarray(feats, jnp.float32)
        hw = f.shape[1:3]
        labels_down = resize_nearest(mask, hw)
        bg_mask = labels_down == 0
        if self.sequential_mode:
            pseudo = labels_down * (labels_down < task.old_classes)
        else:
            sem_old = old_out.sem_logits[..., : task.old_classes]
            use_fused, _ = self._fused_gate(ctx, sem_old, mask)
            if use_fused:
                # nearest-downsampled teacher argmax needs only the interp
                # rows at the sampled positions — the full-res teacher
                # logits never materialize
                from bacs_tpu.ops.upsample_ce import upsampled_argmax_nearest

                old_down = upsampled_argmax_nearest(
                    sem_old, mask.shape[1:3], hw
                )
            else:
                old_pred = jnp.argmax(
                    old_out.logits[..., : task.old_classes], axis=-1
                )
                old_down = resize_nearest(old_pred, hw)
            pseudo = old_down * bg_mask
        c_old = task.old_classes
        onehot = jax.nn.one_hot(pseudo, c_old)  # class 0 excluded below
        onehot = onehot.at[..., 0].set(0.0)
        n = jnp.sum(onehot, axis=(0, 1, 2))
        present = n > 0
        sums = jnp.einsum("nhwc,nhwd->cd", onehot, f)
        cur_proto = sums / jnp.maximum(n, 1.0)[:, None]
        target = jax.lax.stop_gradient(protos[:c_old])
        mse = jnp.mean(jnp.square(cur_proto - target), axis=1)
        n_present = jnp.maximum(jnp.sum(present), 1)
        total = jnp.sum(jnp.where(present, mse, 0.0)) / n_present
        return self.loss_de_prototypes * total
