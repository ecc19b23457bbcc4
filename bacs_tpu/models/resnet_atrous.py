"""SDR-style atrous ResNet backbone (Flax, NHWC, 5 attention maps).

Redesign of the reference ResNet_Atrous (reference: networks/resnet_atrous.py,
adapted there from LTTM/SDR): torchvision-style bottleneck blocks
(BN→ReLU after every conv, post-activation residual), SynchronizedBatchNorm
momentum 3e-4 everywhere, last-stage atrous multipliers ([2,2,2] for
resnet101/152, [1,2,1] for resnet50 — resnet_atrous.py:231-239 `_NETS`), and
FIVE attention maps: post-stem, then each stage output (post-activation,
resnet_atrous.py:194-213 forward) — unlike the ABN ResNet's four
pre-activation maps.

Output stride semantics (resnet_atrous.py:112-118): os16 → stage strides
[2,2,1] with stage-4 atrous ×1; os8 → [2,1,1] with stage-3 atrous 2 and
stage-4 atrous ×2.

The norm layer is injected (`norm=make_norm("bn", sync=True, momentum=3e-4)`)
so cross-replica statistics ride `lax.pmean` over the data mesh axis — the
TPU equivalent of the reference's thread-queue SynchronizedBatchNorm2d.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bacs_tpu.models.norm import ABN
from bacs_tpu.models.resnet import conv, stage_remat

Array = jax.Array

# structure + last-stage atrous multipliers (reference: resnet_atrous.py:231-239)
ATROUS_NETS = {
    "resnet50": ([3, 4, 6, 3], [1, 2, 1]),
    "resnet101": ([3, 4, 23, 3], [2, 2, 2]),
    "resnet152": ([3, 8, 36, 3], [2, 2, 2]),
}


class AtrousBottleneck(nn.Module):
    """Torchvision-style bottleneck: stride on conv2, ReLU after the add
    (reference: resnet_atrous.py:58-106)."""

    planes: int
    stride: int = 1
    atrous: int = 1
    norm: Callable[..., nn.Module] = ABN
    is_training: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        train = self.is_training
        p = self.planes
        out_ch = p * 4
        needs_proj = self.stride != 1 or x.shape[-1] != out_ch

        y = conv(p, 1, dtype=self.dtype, name="conv1")(x)
        y = self.norm(p, name="bn1")(y, use_running_average=not train)
        y = conv(p, 3, self.stride, self.atrous, dtype=self.dtype, name="conv2")(y)
        y = self.norm(p, name="bn2")(y, use_running_average=not train)
        y = conv(out_ch, 1, dtype=self.dtype, name="conv3")(y)
        y = self.norm(out_ch, activation="identity", name="bn3")(
            y, use_running_average=not train
        )
        if needs_proj:
            residual = conv(
                out_ch, 1, self.stride, dtype=self.dtype, name="downsample_conv"
            )(x)
            residual = self.norm(
                out_ch, activation="identity", name="downsample_bn"
            )(residual, use_running_average=not train)
        else:
            residual = x
        return nn.relu(y + residual)


class ResNetAtrous(nn.Module):
    """Returns (features, [5 post-activation attention maps])."""

    structure: Sequence[int] = (3, 4, 23, 3)
    atrous: Sequence[int] = (2, 2, 2)
    output_stride: int = 16
    norm: Callable[..., nn.Module] = ABN
    # False | True | tuple of 1-indexed stage ids (resnet.stage_remat)
    remat: Any = False
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        return 2048

    @nn.compact
    def __call__(self, x: Array, train: bool = True):
        if self.output_stride == 16:
            stride_list = [2, 2, 1]
        elif self.output_stride == 8:
            stride_list = [2, 1, 1]
        else:
            raise ValueError("output stride must be 8 or 16")
        rate = 16 // self.output_stride

        x = conv(64, 7, 2, dtype=self.dtype, name="conv1")(x)
        # fused norm(+relu)+maxpool stem pass (ops/stem_pool.py)
        x = self.norm(64, pool=True, name="bn1")(
            x, use_running_average=not train
        )

        attentions = [x]  # post-stem (reference: resnet_atrous.py:199)
        remat_cls = nn.remat(AtrousBottleneck)
        stage_planes = (64, 128, 256, 512)
        stage_strides = (1, *stride_list)
        for s, (planes, n_blocks) in enumerate(zip(stage_planes, self.structure)):
            block_cls = (
                remat_cls if stage_remat(self.remat, s + 1)
                else AtrousBottleneck
            )
            if s == 3:
                atrous = [a * rate for a in self.atrous]
                atrous = (atrous * n_blocks)[:n_blocks]
            elif s == 2:
                atrous = [rate] * n_blocks
            else:
                atrous = [1] * n_blocks
            for b in range(n_blocks):
                x = block_cls(
                    planes=planes,
                    stride=stage_strides[s] if b == 0 else 1,
                    atrous=atrous[b],
                    norm=self.norm,
                    is_training=train,
                    dtype=self.dtype,
                    name=f"layer{s + 1}_block{b + 1}",
                )(x)
            attentions.append(x)
        return x, attentions


def create_resnet_atrous(
    name: str = "resnet101",
    norm: Callable[..., nn.Module] = ABN,
    output_stride: int = 16,
    remat: Any = False,
    dtype: Any = jnp.float32,
) -> ResNetAtrous:
    structure, atrous = ATROUS_NETS[name]
    return ResNetAtrous(
        structure=tuple(structure),
        atrous=tuple(atrous),
        output_stride=output_stride,
        norm=norm,
        remat=remat,
        dtype=dtype,
    )
