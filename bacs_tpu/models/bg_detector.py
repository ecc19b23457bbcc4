"""BACS seen/unseen background-shift detector, Flax NHWC.

Redesign of the reference BgDetector (reference: networks/bg_detector.py):
a shared 3x3 conv→BN→ReLU→Dropout trunk over backbone features, and one
1x1-conv "siamese distance" head per task that scores
``|sigmoid(feats) − sigmoid(prototype_t)|`` and upsamples ×16
(bilinear, align_corners=True — reference bg_detector.py:13-15).

TPU-first deviations from the reference:
- All task heads are allocated up front as a single [T, D, 1] weight + [T, 1]
  bias (static shapes; the reference appends `classification_head` modules
  per task, learner/baselearner.py:18-24).  Inactive heads are simply unused.
- `stop_grads` replaces the mutable `set_stop_gradients` toggle
  (reference: bg_detector.py:65-73): after task 0 the distance input is
  stop-gradient'ed so detector training does not push the backbone.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from bacs_tpu.ops.interpolate import resize_bilinear

Array = jax.Array


class BgDetector(nn.Module):
    in_channels: int
    n_tasks: int
    dropout_rate: float = 0.1
    upscale: int = 16
    axis_name: str | None = None
    dtype: Any = jnp.float32

    @property
    def inter_channels(self) -> int:
        return self.in_channels // 4

    def setup(self):
        self.base_conv = nn.Conv(
            self.inter_channels,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            use_bias=False,
            dtype=self.dtype,
            name="base_conv",
        )
        self.base_bn = nn.BatchNorm(momentum=0.9, axis_name=self.axis_name, name="base_bn")
        self.dropout = nn.Dropout(self.dropout_rate)
        self.head_kernel = self.param(
            "head_kernel",
            nn.initializers.lecun_normal(),
            (self.n_tasks, self.inter_channels, 1),
        )
        self.head_bias = self.param(
            "head_bias", nn.initializers.zeros, (self.n_tasks, 1)
        )

    def trunk(self, x: Array, train: bool = True) -> Array:
        """Shared base layers → penultimate representation [N,h,w,D/4]."""
        y = self.base_conv(x)
        y = self.base_bn(y, use_running_average=not train)
        y = nn.relu(y)
        y = self.dropout(y, deterministic=not train)
        return y

    def __call__(self, x: Array, train: bool = True) -> Array:
        return self.trunk(x, train=train)

    def _distance(self, x: Array, prototype: Array, stop_grads: bool) -> Array:
        """|sigmoid(x) − sigmoid(proto)| (reference: bg_detector.py:17-36)."""
        if stop_grads:
            x = jax.lax.stop_gradient(x)
            prototype = jax.lax.stop_gradient(prototype)
        return jnp.abs(
            jax.nn.sigmoid(x) - jax.nn.sigmoid(prototype)[None, None, None, :]
        )

    def seen_map_task(
        self, x: Array, prototypes: Array, task_num: int, stop_grads: bool
    ) -> Array:
        """Seen-logit map [N, 16h, 16w, 1] for one task's prototype."""
        dist = self._distance(x, prototypes[task_num], stop_grads)
        out = (
            jnp.einsum("nhwd,do->nhwo", dist, self.head_kernel[task_num])
            + self.head_bias[task_num]
        )
        hw = (out.shape[1] * self.upscale, out.shape[2] * self.upscale)
        return resize_bilinear(out, hw, align_corners=True)

    def seen_probs(self, x: Array, prototypes: Array, n_tasks: int) -> Array:
        """Sigmoid seen-probabilities for tasks [0, n_tasks) → [N,16h,16w,T].

        (reference: bg_detector.py:120-165 `forward_seen_before`+sigmoid)
        """
        outs = []
        for t in range(n_tasks):
            dist = self._distance(x, prototypes[t], stop_grads=False)
            outs.append(
                jnp.einsum("nhwd,do->nhwo", dist, self.head_kernel[t])
                + self.head_bias[t]
            )
        out = jnp.concatenate(outs, axis=-1)
        hw = (out.shape[1] * self.upscale, out.shape[2] * self.upscale)
        return jax.nn.sigmoid(resize_bilinear(out, hw, align_corners=True))
