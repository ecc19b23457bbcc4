"""Prototype-space visualization: t-SNE scatter + distance-to-prototype plots.

Redesign of the reference LogPrototypes (reference: visualization/
log_prototypes.py:119-248, plotly/kaleido → matplotlib here): per-class mean
penultimate features over an eval pass, embedded with t-SNE alongside the
stored task prototypes, plus per-class L1 distance to the owning prototype.
"""

from __future__ import annotations

import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from bacs_tpu.methods.base import ModelContext, label_task_ids
from bacs_tpu.ops.interpolate import resize_nearest
from bacs_tpu.train.state import TrainState


class PrototypeLogger:
    def __init__(self, out_dir: str, max_batches: int = 8):
        self.out_dir = out_dir
        self.max_batches = max_batches

    def collect(self, ctx: ModelContext, state: TrainState, batches) -> Dict:
        """Per-class mean penultimate features over ≤max_batches."""
        task = ctx.task
        c = task.num_classes

        @jax.jit
        def step(state, image, label, sums, counts):
            out, _ = ctx.forward(state.params, state.batch_stats, image, False)
            feats = out.penultimate.astype(jnp.float32)
            lbl = resize_nearest(label, feats.shape[1:3])
            valid = lbl != task.ignore_index
            onehot = jax.nn.one_hot(jnp.where(valid, lbl, 0), c) * valid[..., None]
            sums = sums + jnp.einsum("nhwc,nhwd->cd", onehot, feats)
            counts = counts + jnp.sum(onehot, axis=(0, 1, 2))
            return sums, counts

        d = state.prototypes.shape[-1]
        sums = jnp.zeros((c, d))
        counts = jnp.zeros((c,))
        for i, batch in enumerate(batches):
            if i >= self.max_batches:
                break
            sums, counts = step(state, batch["image"], batch["label"], sums, counts)
        means = np.asarray(sums) / np.maximum(np.asarray(counts)[:, None], 1.0)
        return {"class_means": means, "counts": np.asarray(counts)}

    def plot(self, ctx: ModelContext, state: TrainState, collected: Dict,
             task_id: int) -> List[str]:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from sklearn.manifold import TSNE

        os.makedirs(self.out_dir, exist_ok=True)
        means = collected["class_means"]
        counts = collected["counts"]
        present = counts > 0
        protos = np.asarray(state.prototypes[: task_id + 1])
        paths = []

        # t-SNE of class means + prototypes (log_prototypes.py:119-178)
        pts = np.concatenate([means[present], protos], axis=0)
        if not np.isfinite(pts).all():
            return paths  # diverged model — nothing meaningful to embed
        if pts.shape[0] >= 3:
            emb = TSNE(
                n_components=2, perplexity=min(5, pts.shape[0] - 1), init="random"
            ).fit_transform(pts)
            n_cls = int(present.sum())
            fig, ax = plt.subplots(figsize=(6, 5))
            ax.scatter(emb[:n_cls, 0], emb[:n_cls, 1], c="tab:blue", label="class mean")
            ax.scatter(
                emb[n_cls:, 0], emb[n_cls:, 1], c="tab:red", marker="*", s=120,
                label="task prototype",
            )
            for i, cls in enumerate(np.where(present)[0]):
                ax.annotate(str(cls), emb[i])
            ax.legend()
            p = os.path.join(self.out_dir, f"tsne_task{task_id}.png")
            fig.savefig(p, dpi=100)
            plt.close(fig)
            paths.append(p)

        # L1 distance of each class mean to its task prototype (:180-248)
        task_of_class = np.asarray(
            label_task_ids(jnp.arange(means.shape[0]), ctx.task)
        )
        dists = []
        classes = []
        for cls in np.where(present)[0]:
            t = min(int(task_of_class[cls]), protos.shape[0] - 1)
            dists.append(np.abs(means[cls] - protos[t]).mean())
            classes.append(cls)
        if classes:
            fig, ax = plt.subplots(figsize=(6, 3))
            ax.bar([str(c) for c in classes], dists)
            ax.set_ylabel("L1 to task prototype")
            p = os.path.join(self.out_dir, f"proto_dist_task{task_id}.png")
            fig.savefig(p, dpi=100)
            plt.close(fig)
            paths.append(p)
        return paths
