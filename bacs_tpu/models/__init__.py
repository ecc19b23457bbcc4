"""Flax network zoo: DeepLabV3, UNet, TranSeg (+BgDetector, ABN).

`create_network` is the registry the config layer uses in place of the
reference's Hydra `_target_` instantiation of networks
(reference: training/trainer.py:238-240).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from bacs_tpu.models.base import NetOutput  # noqa: F401
from bacs_tpu.models.bg_detector import BgDetector  # noqa: F401
from bacs_tpu.models.deeplab import DeepLabHead, DeepLabV3  # noqa: F401
from bacs_tpu.models.norm import ABN, make_norm  # noqa: F401
from bacs_tpu.models.resnet import ResNet, create_resnet  # noqa: F401
from bacs_tpu.models.transeg import TranSeg  # noqa: F401
from bacs_tpu.models.unet import UNet  # noqa: F401


def create_network(
    name: str,
    num_classes: int,
    n_tasks: int = 1,
    use_bg_detector: bool = False,
    active_classes: int | None = None,
    norm: str = "iabn_sync",
    axis_name: str | None = "data",
    crop_size: int = 512,
    dtype: Any = jnp.float32,
    **kwargs: Any,
):
    """Build a network module from a reference-style target name.

    Accepts both reference `_target_` strings ("networks.DeepLabV3") and
    short names ("deeplab", "unet", "transeg").
    """
    short = name.rsplit(".", 1)[-1].lower()
    # SDR-style atrous encoder: plain sync-BN momentum 3e-4, default output
    # stride 16 like any DeepLab (reference: networks/resnet_atrous.py:31,129;
    # deeplab_v3.py:29 `output_stride = kwargs.get(..., 16)`)
    atrous = bool(kwargs.get("atrous_encoder"))
    fused_abn = bool(kwargs.get("fused_abn", True))
    fused_stem = bool(kwargs.get("fused_stem", False))
    # network.remat: false | true (all stages) | [stage ids] (selective,
    # e.g. [3] remats only resnet101's 23-block stage — most of the saved
    # activations at a fraction of full remat's recompute). Normalized to a
    # hashable tuple so the module stays usable as a jit cache key.
    remat = kwargs.get("remat", False)
    remat = (
        tuple(int(s) for s in remat)
        if isinstance(remat, (list, tuple))
        else bool(remat)
    )
    if atrous:
        # SDR atrous encoder: SynchronizedBatchNorm2d(momentum 3e-4) on the
        # WHOLE model, BN+ReLU (reference: networks/resnet_atrous.py:8,31;
        # deeplab_v3.py:72-75 `bn` branch with use_sync_batch=True)
        norm_factory = make_norm(
            "bn", axis_name=axis_name, momentum=3e-4, sync=True,
            fused=fused_abn, fused_stem=fused_stem,
        )
    else:
        norm_factory = make_norm(
            norm, axis_name=axis_name, fused=fused_abn, fused_stem=fused_stem
        )
    if short in ("deeplabv3", "deeplab", "deep_lab"):
        return DeepLabV3(
            num_classes=num_classes,
            backbone_name=kwargs.get("backbone", "resnet101"),
            output_stride=kwargs.get("output_stride", 16),
            norm=norm_factory,
            n_tasks=n_tasks,
            use_bg_detector=use_bg_detector,
            atrous_encoder=atrous,
            remat=remat,
            axis_name=axis_name,
            dtype=dtype,
        )
    if short == "unet":
        return UNet(
            num_classes=num_classes,
            n_channels=kwargs.get("n_channels", 3),
            bilinear=kwargs.get("bilinear", True),
            num_layers=kwargs.get("num_layers", 5),
            n_tasks=n_tasks,
            use_bg_detector=use_bg_detector,
            axis_name=axis_name,
            dtype=dtype,
        )
    if short in ("transeg", "deep_lab_transformer"):
        tr = kwargs.get("transformer", {}) or {}
        return TranSeg(
            num_classes=num_classes,
            crop_size=crop_size,
            active_classes=active_classes,
            backbone_name=kwargs.get("backbone", "resnet101"),
            output_stride=kwargs.get("output_stride", 16),
            norm=norm_factory,
            hidden_dim=tr.get("hidden_dim", 256),
            nhead=tr.get("nhead", 2),
            num_decoder_layers=tr.get("num_decoder_layers", 2),
            dim_feedforward=tr.get("dim_feedforward", 2048),
            n_tasks=n_tasks,
            use_bg_detector=use_bg_detector,
            axis_name=axis_name,
            remat=remat,
            dtype=dtype,
        )
    raise ValueError(f"unknown network {name!r}")
