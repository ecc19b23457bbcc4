"""UNet as a Flax module, NHWC.

Redesign of the reference UNet (reference: networks/unet.py:10-180): classic
encoder/decoder with DoubleConv blocks, configurable depth and
bilinear/transpose upsampling.  Attention maps are the encoder outputs from
stage 2 onward (reference: unet.py:157-160), penultimate = encoder bottom
(reference: unet.py:121-130).  The classifier head is a single padded 1x1
conv over the final class count (functional multi-head; see deeplab.py).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from bacs_tpu.models.base import NetOutput
from bacs_tpu.models.bg_detector import BgDetector
from bacs_tpu.ops.interpolate import resize_bilinear

Array = jax.Array


class DoubleConv(nn.Module):
    out_channels: int
    mid_channels: int | None = None
    axis_name: str | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        mid = self.mid_channels or self.out_channels
        for i, ch in enumerate((mid, self.out_channels)):
            x = nn.Conv(
                ch, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                name=f"conv{i + 1}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                axis_name=self.axis_name, name=f"bn{i + 1}",
            )(x)
            x = nn.relu(x)
        return x


class UNet(nn.Module):
    num_classes: int
    n_channels: int = 3
    bilinear: bool = True
    num_layers: int = 5
    n_tasks: int = 1
    use_bg_detector: bool = False
    axis_name: str | None = None
    dtype: Any = jnp.float32

    @property
    def encoder_output_dim(self) -> int:
        # 64 * 2^(num_layers-2) * (1 if bilinear else 2)
        feat = 64 * (2 ** (self.num_layers - 2))
        return feat if self.bilinear else feat * 2

    @property
    def penultimate_dim(self) -> int:
        if self.use_bg_detector:
            return self.encoder_output_dim // 4
        return self.encoder_output_dim

    @property
    def penultimate_stats_keys(self):
        """Reference get_penultimate_output path (unet.py:121-130: the
        encoder only — unlike DeepLab/TranSeg it does NOT apply the
        detector trunk) — see DeepLabV3.penultimate_stats_keys."""
        return ("inc",) + tuple(
            f"down{i + 1}" for i in range(self.num_layers - 1)
        )

    @property
    def out_in_planes(self) -> int:
        return 64 // 2 if self.bilinear else 64

    def setup(self):
        if self.use_bg_detector:
            # encoder bottom sits at stride 2^(num_layers-1); the detector
            # upsamples back to input resolution
            self.seen_fg_network = BgDetector(
                in_channels=self.encoder_output_dim,
                n_tasks=self.n_tasks,
                upscale=2 ** (self.num_layers - 1),
                axis_name=self.axis_name,
                dtype=self.dtype,
            )

    def seen_map_task(self, penultimate, prototypes, task_num, stop_grads):
        return self.seen_fg_network.seen_map_task(
            penultimate, prototypes, task_num, stop_grads
        )

    def seen_probs(self, penultimate, prototypes, n_tasks):
        return self.seen_fg_network.seen_probs(penultimate, prototypes, n_tasks)

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> NetOutput:
        skips = [DoubleConv(64, axis_name=self.axis_name, dtype=self.dtype, name="inc")(x, train=train)]
        attentions = []
        feat = 64
        # encoder (reference: unet.py:99-111)
        for i in range(self.num_layers - 1):
            is_last = i == self.num_layers - 2
            out_ch = feat if (is_last and self.bilinear) else feat * 2
            y = nn.max_pool(skips[-1], (2, 2), strides=(2, 2))
            y = DoubleConv(out_ch, axis_name=self.axis_name, dtype=self.dtype, name=f"down{i + 1}")(
                y, train=train
            )
            skips.append(y)
            if i > 0:
                attentions.append(y)
            feat = feat * 2  # channel-count bookkeeping mirrors torch version

        encoder_bottom = skips[-1]
        # decoder (reference: unet.py:43-72 Up blocks)
        y = encoder_bottom
        in_feat = feat  # concat width tracker
        for i in range(self.num_layers - 1):
            skip = skips[-2 - i]
            if self.bilinear:
                y = resize_bilinear(
                    y, (y.shape[1] * 2, y.shape[2] * 2), align_corners=True
                )
                out_ch = in_feat // 4 if i < self.num_layers - 2 else 32
                mid = in_feat // 2
            else:
                y = nn.ConvTranspose(
                    y.shape[-1] // 2, (2, 2), strides=(2, 2), dtype=self.dtype,
                    name=f"up_tconv{i + 1}",
                )(y)
                out_ch = in_feat // 2 if i < self.num_layers - 2 else 64
                mid = None
            y = jnp.concatenate([skip, y], axis=-1)
            y = DoubleConv(out_ch, mid, axis_name=self.axis_name, dtype=self.dtype, name=f"up{i + 1}")(
                y, train=train
            )
            in_feat //= 2

        sem_logits = nn.Conv(
            self.num_classes, (1, 1), dtype=self.dtype, name="classifier_head"
        )(y)
        penultimate = encoder_bottom
        if self.use_bg_detector:
            penultimate = self.seen_fg_network.trunk(encoder_bottom, train=train)
        return NetOutput(
            logits=sem_logits.astype(jnp.float32),
            sem_logits=sem_logits,
            penultimate=penultimate,
            attentions=tuple(attentions),
        )
