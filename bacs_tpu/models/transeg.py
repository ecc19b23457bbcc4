"""TranSeg: DeepLab backbone + transformer mask decoder with class tokens.

Redesign of the reference TranSeg (reference: networks/transeg.py:15-197):
ResNet backbone → 1x1 feature embedding → +learned 2-D positional embedding
→ append per-class tokens → N decoder blocks → L2-normalized patch·classᵀ
mask logits → LayerNorm over classes.

TPU-first continual design: `class_tokens` [num_classes, D] and the
`mask_norm` parameters are allocated at the FINAL class count; each task
instantiates the module with `active_classes=C_cur` which statically slices
tokens and norm params, so shapes stay static within a task and only one
recompile happens per task boundary.  This replaces the reference's
TransformerLearner token growth (reference: learner/transformerlearner.py:
48-135); new-token init modes (random/background/mean) are parameter surgery
in train/learner.py.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from bacs_tpu.models.base import NetOutput
from bacs_tpu.models.bg_detector import BgDetector
from bacs_tpu.models.layers import Block
from bacs_tpu.models.norm import ABN
from bacs_tpu.models.resnet import create_resnet
from bacs_tpu.ops.interpolate import resize_bilinear

Array = jax.Array

NEG_INF = -1e9  # fill for inactive class channels


class TransformerHead(nn.Module):
    """(reference: networks/transeg.py:85-175)"""

    in_channels: int
    crop_size: int
    num_classes: int
    active_classes: int
    hidden_dim: int = 256
    nhead: int = 2
    num_decoder_layers: int = 2
    dim_feedforward: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = True):
        b, h, w, _ = x.shape
        d = self.hidden_dim
        n_cls = self.active_classes
        patches = self.crop_size // 16

        x = nn.Conv(d, (1, 1), dtype=self.dtype, name="feature_embedding")(x)
        pos = self.param(
            "pos_embed", nn.initializers.normal(1.0), (1, patches, patches, d)
        )
        x = x + pos[:, :h, :w, :]
        x = x.reshape(b, h * w, d)

        class_tokens = self.param(
            "class_tokens",
            nn.initializers.truncated_normal(0.02),
            (self.num_classes, d),
        )
        tokens = jnp.broadcast_to(class_tokens[:n_cls], (b, n_cls, d)).astype(x.dtype)
        x = jnp.concatenate([x, tokens], axis=1)

        for i in range(self.num_decoder_layers):
            x = Block(
                d, self.nhead, self.dim_feedforward, dtype=self.dtype,
                name=f"block{i}",
            )(x, train=train)
        x = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")(x)  # torch LN eps

        patch_tokens, cls_feat = x[:, :-n_cls], x[:, -n_cls:]
        image_feats = patch_tokens.reshape(b, h, w, d)

        scale = d**-0.5
        proj_patch = self.param(
            "proj_patch", nn.initializers.normal(scale), (d, d)
        )
        proj_classes = self.param(
            "proj_classes", nn.initializers.normal(scale), (d, d)
        )
        p = patch_tokens @ proj_patch
        c = cls_feat @ proj_classes
        p = p / (jnp.linalg.norm(p, axis=-1, keepdims=True) + 1e-8)
        c = c / (jnp.linalg.norm(c, axis=-1, keepdims=True) + 1e-8)
        masks = jnp.einsum("bnd,bmd->bnm", p, c)  # [b, hw, n_cls]

        # mask_norm: LayerNorm over the ACTIVE class dim with full-size params
        # (reference grows a fresh LayerNorm per task, transformerlearner.py)
        mn_scale = self.param(
            "mask_norm_scale", nn.initializers.ones, (self.num_classes,)
        )
        mn_bias = self.param(
            "mask_norm_bias", nn.initializers.zeros, (self.num_classes,)
        )
        mu = jnp.mean(masks, axis=-1, keepdims=True)
        var = jnp.var(masks, axis=-1, keepdims=True)
        masks = (masks - mu) * jax.lax.rsqrt(var + 1e-5)
        masks = masks * mn_scale[:n_cls] + mn_bias[:n_cls]

        masks = masks.reshape(b, h, w, n_cls)
        return masks, image_feats


class TranSeg(nn.Module):
    num_classes: int
    crop_size: int = 512
    active_classes: int | None = None
    backbone_name: str = "resnet101"
    output_stride: int = 16
    norm: Any = ABN
    hidden_dim: int = 256
    nhead: int = 2
    num_decoder_layers: int = 2
    dim_feedforward: int = 2048
    n_tasks: int = 1
    use_bg_detector: bool = False
    axis_name: Any = None
    # jax.checkpoint backbone blocks (memory trade): False | True | stage ids
    remat: Any = False
    dtype: Any = jnp.float32

    @property
    def penultimate_dim(self) -> int:
        out_ch = 2048
        return out_ch // 4 if self.use_bg_detector else out_ch

    @property
    def penultimate_stats_keys(self):
        """Subtrees that double-drift per population batch — backbone only:
        the trunk runs once (probe, transeg.py:66-70) in the reference and
        once (full forward) here.  See DeepLabV3.penultimate_stats_keys."""
        return ("backbone",)

    def setup(self):
        self.backbone = create_resnet(
            self.backbone_name,
            norm=self.norm,
            output_stride=self.output_stride,
            remat=self.remat,
            dtype=self.dtype,
        )
        self.base_classifier = TransformerHead(
            in_channels=self.backbone.out_channels,
            crop_size=self.crop_size,
            num_classes=self.num_classes,
            active_classes=self.active_classes or self.num_classes,
            hidden_dim=self.hidden_dim,
            nhead=self.nhead,
            num_decoder_layers=self.num_decoder_layers,
            dim_feedforward=self.dim_feedforward,
            dtype=self.dtype,
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
        n_active = self.active_classes or self.num_classes
        backbone_out, attentions = self.backbone(x, train=train)
        masks, image_feats = self.base_classifier(backbone_out, train=train)
        attentions = attentions + [image_feats]
        # pad inactive channels so every network emits full-width sem logits
        if n_active < self.num_classes:
            pad = jnp.full(
                masks.shape[:3] + (self.num_classes - n_active,),
                NEG_INF,
                masks.dtype,
            )
            sem_logits = jnp.concatenate([masks, pad], axis=-1)
        else:
            sem_logits = masks
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

    def seen_map_task(self, penultimate, prototypes, task_num, stop_grads):
        return self.seen_fg_network.seen_map_task(
            penultimate, prototypes, task_num, stop_grads
        )

    def seen_probs(self, penultimate, prototypes, n_tasks):
        return self.seen_fg_network.seen_probs(penultimate, prototypes, n_tasks)
