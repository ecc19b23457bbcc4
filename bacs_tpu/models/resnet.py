"""ResNet backbones (ABN-style) in Flax, NHWC, attention-map outputs.

Functional redesign of the reference's ABN ResNet
(reference: networks/resnet.py:16-489) and the SDR atrous variant
(reference: networks/resnet_atrous.py): bottleneck blocks whose norm layers
are fused ABN (norm+leaky-relu), with the *last* block of every stage also
returning its pre-activation tensor as an "attention" map for POD
distillation (reference: networks/resnet.py:141-168, forward 402-420).

TPU notes: NHWC layout feeds the MXU directly; dilated convs for output
stride 8/16 keep static shapes; bfloat16 activations are supported via the
`dtype` attribute while ABN statistics stay float32.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bacs_tpu.models.norm import ABN, _activate

Array = jax.Array


def stage_remat(remat, stage: int) -> bool:
    """Whether stage `stage` (1-indexed: 1=highest-resolution stage) should
    rematerialize its blocks. `remat` is False, True (all stages), or a
    tuple of stage ids — `network.remat=[3]` remats only the 23-block
    stage-3 of a resnet101, which holds the bulk of the saved activations
    while costing far less recompute than full remat."""
    if isinstance(remat, (tuple, list)):
        return stage in tuple(remat)
    return bool(remat)


# structure table (reference: networks/resnet.py:423-428)
RESNET_STRUCTURES = {
    "resnet18": ([2, 2, 2, 2], False),
    "resnet34": ([3, 4, 6, 3], False),
    "resnet50": ([3, 4, 6, 3], True),
    "resnet101": ([3, 4, 23, 3], True),
    "resnet152": ([3, 8, 36, 3], True),
}


def conv(features, kernel, stride=1, dilation=1, dtype=jnp.float32, name=None):
    pad = ((kernel - 1) // 2) * dilation
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        kernel_dilation=(dilation, dilation),
        use_bias=False,
        dtype=dtype,
        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
        name=name,
    )


class Bottleneck(nn.Module):
    """ABN bottleneck block; optionally emits its pre-activation output.

    (reference: networks/resnet.py:16-168 ResidualBlock with 3 channels)
    """

    channels: Tuple[int, int, int]
    stride: int = 1
    dilation: int = 1
    norm: Callable[..., nn.Module] = ABN
    last: bool = False
    is_training: bool = True  # attribute (not arg) so nn.remat wraps cleanly
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array):
        train = self.is_training
        c1, c2, c3 = self.channels
        needs_proj = self.stride != 1 or x.shape[-1] != c3

        y = conv(c1, 1, dtype=self.dtype, name="conv1")(x)
        y = self.norm(c1, name="bn1")(y, use_running_average=not train)
        y = conv(c2, 3, self.stride, self.dilation, dtype=self.dtype, name="conv2")(y)
        y = self.norm(c2, name="bn2")(y, use_running_average=not train)
        y = conv(c3, 1, dtype=self.dtype, name="conv3")(y)
        # final norm has identity activation; activation applied after the add
        y = self.norm(c3, activation="identity", name="bn3")(
            y, use_running_average=not train
        )

        if needs_proj:
            residual = conv(c3, 1, self.stride, dtype=self.dtype, name="proj_conv")(x)
            residual = self.norm(c3, activation="identity", name="proj_bn")(
                residual, use_running_average=not train
            )
        else:
            residual = x

        pre_act = y + residual
        # match the stage's activation (leaky_relu under ABN, relu under BN)
        probe = self.norm(c1, parent=None)  # read activation config
        act = _activate(pre_act, probe.activation, probe.activation_param)
        if self.last:
            return act, pre_act
        return act


class BasicBlock(nn.Module):
    """Two-conv residual block (resnet18/34)."""

    channels: Tuple[int, int]
    stride: int = 1
    dilation: int = 1
    norm: Callable[..., nn.Module] = ABN
    last: bool = False
    is_training: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array):
        train = self.is_training
        c1, c2 = self.channels
        needs_proj = self.stride != 1 or x.shape[-1] != c2
        y = conv(c1, 3, self.stride, self.dilation, dtype=self.dtype, name="conv1")(x)
        y = self.norm(c1, name="bn1")(y, use_running_average=not train)
        y = conv(c2, 3, 1, self.dilation, dtype=self.dtype, name="conv2")(y)
        y = self.norm(c2, activation="identity", name="bn2")(
            y, use_running_average=not train
        )
        if needs_proj:
            residual = conv(c2, 1, self.stride, dtype=self.dtype, name="proj_conv")(x)
            residual = self.norm(c2, activation="identity", name="proj_bn")(
                residual, use_running_average=not train
            )
        else:
            residual = x
        pre_act = y + residual
        probe = self.norm(c1, parent=None)
        act = _activate(pre_act, probe.activation, probe.activation_param)
        if self.last:
            return act, pre_act
        return act


class ResNet(nn.Module):
    """4-stage ResNet returning (features, [4 attention maps]).

    Output stride 16 → dilation [1,1,1,2]; 8 → [1,1,2,4]
    (reference: networks/resnet.py:340-344).
    """

    structure: Sequence[int] = (3, 4, 23, 3)
    bottleneck: bool = True
    output_stride: int = 16
    norm: Callable[..., nn.Module] = ABN
    # jax.checkpoint blocks (trade FLOPs for memory): False | True | tuple
    # of 1-indexed stage ids to remat selectively (see stage_remat)
    remat: Any = False
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        return 2048 if self.bottleneck else 512

    @nn.compact
    def __call__(self, x: Array, train: bool = True):
        if self.output_stride == 16:
            dilation = [1, 1, 1, 2]
        elif self.output_stride == 8:
            dilation = [1, 1, 2, 4]
        else:
            raise ValueError("output stride must be 8 or 16")

        x = conv(64, 7, 2, dtype=self.dtype, name="conv1")(x)
        # norm + leaky-relu + 3x3/2 maxpool in one fused HBM pass
        # (ops/stem_pool.py; same params/stats as a plain bn1 + nn.max_pool)
        x = self.norm(64, pool=True, name="bn1")(
            x, use_running_average=not train
        )

        attentions = []
        channels = (64, 64, 256) if self.bottleneck else (64, 64)
        base_cls = Bottleneck if self.bottleneck else BasicBlock
        # rematerialize block activations in the backward pass
        # (SURVEY §7: BACS runs up to 4 forwards per step at 512²)
        remat_cls = nn.remat(base_cls)
        for mod_id, num in enumerate(self.structure):
            block_cls = (
                remat_cls if stage_remat(self.remat, mod_id + 1) else base_cls
            )
            d = dilation[mod_id]
            for block_id in range(num):
                stride = 2 if d == 1 and block_id == 0 and mod_id > 0 else 1
                last = block_id == num - 1
                out = block_cls(
                    channels=tuple(channels),
                    stride=stride,
                    dilation=d,
                    norm=self.norm,
                    last=last,
                    is_training=train,
                    dtype=self.dtype,
                    name=f"mod{mod_id + 2}_block{block_id + 1}",
                )(x)
                if last:
                    x, att = out
                    attentions.append(att)
                else:
                    x = out
            channels = tuple(c * 2 for c in channels)
        return x, attentions


def create_resnet(
    name: str = "resnet101",
    norm: Callable[..., nn.Module] = ABN,
    output_stride: int = 16,
    remat: Any = False,
    dtype: Any = jnp.float32,
) -> ResNet:
    structure, bottleneck = RESNET_STRUCTURES[name]
    return ResNet(
        structure=structure,
        bottleneck=bottleneck,
        output_stride=output_stride,
        norm=norm,
        remat=remat,
        dtype=dtype,
    )
