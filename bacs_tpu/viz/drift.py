"""Representation-drift probe.

Redesign of the reference LogDrift (reference: visualization/log_drift.py):
after each task's test, snapshot ≤N samples and their L2-normalized
penultimate features; during the next task, periodically recompute the
penultimate on those frozen samples and log the mean |Δ| as
`representation_drift` (consumed at reference training/model.py:371-374).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bacs_tpu.methods.base import ModelContext
from bacs_tpu.train.state import TrainState

Array = jax.Array


def _normalize(x: Array) -> Array:
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / (n + 1e-5)


class DriftProbe:
    def __init__(self, max_samples: int = 10, measure_every: int = 50):
        self.max_samples = max_samples
        self.measure_every = measure_every
        self._images: Optional[np.ndarray] = None
        self._feats: Optional[np.ndarray] = None

    def snapshot(self, ctx: ModelContext, state: TrainState, batch: Dict):
        """Freeze ≤max_samples + their normalized penultimate features
        (reference: log_drift.py:22-42 on_test_end)."""
        images = np.asarray(batch["image"][: self.max_samples])
        self._images = images
        self._feats = np.asarray(_feats_fn(ctx)(state, jnp.asarray(images)))

    def measure(self, ctx: ModelContext, state: TrainState, step: int):
        """Mean |Δ| of normalized features on the frozen samples
        (reference: log_drift.py:44-62)."""
        if self._images is None or step % self.measure_every != 0:
            return None
        return float(
            _drift_fn(ctx)(
                state, jnp.asarray(self._images), jnp.asarray(self._feats)
            )
        )


@functools.lru_cache(maxsize=16)
def _feats_fn(ctx: ModelContext):
    def feats(state, image):
        out, _ = ctx.forward(state.params, state.batch_stats, image, False)
        return _normalize(out.penultimate)

    return jax.jit(feats)


@functools.lru_cache(maxsize=16)
def _drift_fn(ctx: ModelContext):
    def drift(state, image, old_feats):
        out, _ = ctx.forward(state.params, state.batch_stats, image, False)
        return jnp.mean(jnp.abs(_normalize(out.penultimate) - old_feats))

    return jax.jit(drift)
