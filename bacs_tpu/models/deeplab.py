"""DeepLabV3 (ResNet backbone + ASPP) as a Flax module, NHWC.

Redesign of the reference DeepLabV3 (reference: networks/deeplab_v3.py:22-341):
ResNet-101 backbone with ABN norm, ASPP head with dilations [6,12,18] at
output-stride 16 ([12,24,32] at os 8), a global-pooling branch, and a padded
single-conv classifier head covering the *final* class count (the functional
equivalent of the reference's per-task ModuleList concat,
networks/base_network.py:99-118 — a 1x1 conv partitioned over output channels
is exactly a concat of per-task 1x1 convs).

The classifier head weight is named `classifier_head` so continual head
surgery (MiB imprinting init) can address per-class rows directly.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from bacs_tpu.models.base import NetOutput
from bacs_tpu.models.bg_detector import BgDetector
from bacs_tpu.models.norm import ABN
from bacs_tpu.models.resnet import conv, create_resnet
from bacs_tpu.ops.interpolate import resize_bilinear

Array = jax.Array


class DeepLabHead(nn.Module):
    """ASPP head (reference: networks/deeplab_v3.py:175-305).

    4 parallel map convs (1x1 + three dilated 3x3) → concat → ABN → 1x1
    reduction, summed with a broadcast global-pooling branch, then a final
    ABN.  All convs are bias-free; activations ride the fused ABN.
    """

    in_channels: int
    out_channels: int = 256
    hidden_channels: int = 256
    out_stride: int = 16
    norm: Callable[..., nn.Module] = ABN
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        dil = [6, 12, 18] if self.out_stride == 16 else [12, 24, 32]
        h = self.hidden_channels
        maps = [
            conv(h, 1, dtype=self.dtype, name="map_conv0")(x),
            conv(h, 3, dilation=dil[0], dtype=self.dtype, name="map_conv1")(x),
            conv(h, 3, dilation=dil[1], dtype=self.dtype, name="map_conv2")(x),
            conv(h, 3, dilation=dil[2], dtype=self.dtype, name="map_conv3")(x),
        ]
        out = jnp.concatenate(maps, axis=-1)
        out = self.norm(h * 4, name="map_bn")(out, use_running_average=not train)
        out = conv(self.out_channels, 1, dtype=self.dtype, name="red_conv")(out)

        # global pooling branch (adaptive avg-pool to 1x1, broadcast back)
        pool = jnp.mean(x, axis=(1, 2), keepdims=True)
        pool = conv(h, 1, dtype=self.dtype, name="global_pooling_conv")(pool)
        pool = self.norm(h, name="global_pooling_bn")(
            pool, use_running_average=not train
        )
        pool = conv(self.out_channels, 1, dtype=self.dtype, name="pool_red_conv")(pool)

        out = out + pool  # broadcast over H, W
        out = self.norm(self.out_channels, name="red_bn")(
            out, use_running_average=not train
        )
        return out


class DeepLabV3(nn.Module):
    """DeepLabV3 with ResNet backbone; returns the full NetOutput contract."""

    num_classes: int  # FINAL class count (full allocation, masked per task)
    backbone_name: str = "resnet101"
    output_stride: int = 16
    norm: Callable[..., nn.Module] = ABN
    n_tasks: int = 1  # bg-detector head count when enabled
    use_bg_detector: bool = False
    atrous_encoder: bool = False  # SDR ResNet_Atrous backbone (5 attentions)
    remat: Any = False  # False | True | tuple of stage ids (resnet.stage_remat)
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    out_in_planes: int = 256

    def setup(self):
        if self.atrous_encoder:
            from bacs_tpu.models.resnet_atrous import create_resnet_atrous

            self.backbone = create_resnet_atrous(
                self.backbone_name,
                norm=self.norm,
                output_stride=self.output_stride,
                remat=self.remat,
                dtype=self.dtype,
            )
        else:
            self.backbone = create_resnet(
                self.backbone_name,
                norm=self.norm,
                output_stride=self.output_stride,
                remat=self.remat,
                dtype=self.dtype,
            )
        self.base_classifier = DeepLabHead(
            in_channels=self.backbone.out_channels,
            out_channels=self.out_in_planes,
            out_stride=self.output_stride,
            norm=self.norm,
            dtype=self.dtype,
        )
        self.classifier_head = nn.Conv(
            self.num_classes, (1, 1), dtype=self.dtype, name="classifier_head"
        )
        if self.use_bg_detector:
            self.seen_fg_network = BgDetector(
                in_channels=self.backbone.out_channels,
                n_tasks=self.n_tasks,
                axis_name=self.axis_name,
                dtype=self.dtype,
            )

    def __call__(self, x: Array, train: bool = True) -> NetOutput:
        input_hw = x.shape[1:3]
        backbone_out, attentions = self.backbone(x, train=train)
        feats = self.base_classifier(backbone_out, train=train)
        attentions = attentions + [feats]
        sem_logits = self.classifier_head(feats)
        logits = resize_bilinear(
            sem_logits.astype(jnp.float32), input_hw, align_corners=False
        )
        penultimate = backbone_out
        if self.use_bg_detector:
            penultimate = self.seen_fg_network.trunk(backbone_out, train=train)
        return NetOutput(
            logits=logits,
            sem_logits=sem_logits,
            penultimate=penultimate,
            attentions=tuple(attentions),
        )

    # --- BgDetector passthroughs (used via nn.apply method=...) ---

    def seen_map_task(
        self, penultimate: Array, prototypes: Array, task_num: int, stop_grads: bool
    ) -> Array:
        """Seen-logit map against one task prototype (training the detector)."""
        return self.seen_fg_network.seen_map_task(
            penultimate, prototypes, task_num, stop_grads
        )

    def seen_probs(self, penultimate: Array, prototypes: Array, n_tasks: int) -> Array:
        """Sigmoid seen-probabilities against the first n_tasks prototypes."""
        return self.seen_fg_network.seen_probs(penultimate, prototypes, n_tasks)

    @property
    def penultimate_dim(self) -> int:
        out_ch = 2048 if self.backbone_name in ("resnet50", "resnet101", "resnet152") else 512
        if self.use_bg_detector:
            return out_ch // 4  # BgDetector trunk width (bg_detector.py)
        return out_ch

    @property
    def penultimate_stats_keys(self):
        """batch_stats subtrees that drift TWICE per buffer-population
        batch in the reference (methods/bacs.py end_task mirrors this) =
        the probe path (get_penultimate_output, deeplab_v3.py:110-119:
        backbone + detector trunk) INTERSECTED with the plain population
        forward (bacs_loss.py:182 `model(images)`: backbone + head, NO
        trunk).  The trunk BN (bg_detector.py:57-62) drifts exactly ONCE —
        via the probe there, via our full forward here — so it must NOT be
        double-copied (pinned by
        test_boundary_parity.test_detector_double_drift_stats_parity)."""
        return ("backbone",)
