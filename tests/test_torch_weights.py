"""Torch→Flax backbone weight conversion."""

import numpy as np
import pytest
import torch

from bacs_tpu.models import create_network
from bacs_tpu.utils.torch_weights import _convert


def _fake_abn_resnet18_sd():
    """Minimal ABN-style state dict matching our resnet18 names
    (reference layout: networks/resnet.py OrderedDict names)."""
    sd = {}
    sd["mod1.conv1.weight"] = np.random.randn(64, 3, 7, 7).astype(np.float32)
    sd["mod1.bn1.weight"] = -np.abs(np.random.randn(64).astype(np.float32))
    sd["mod1.bn1.bias"] = np.random.randn(64).astype(np.float32)
    sd["mod1.bn1.running_mean"] = np.random.randn(64).astype(np.float32)
    sd["mod1.bn1.running_var"] = np.abs(np.random.randn(64)).astype(np.float32)
    # first block of stage 2 (basic block: conv1/conv2, 64→64)
    sd["mod2.block1.convs.conv1.weight"] = np.random.randn(64, 64, 3, 3).astype(
        np.float32
    )
    sd["mod2.block1.convs.bn1.weight"] = np.random.rand(64).astype(np.float32)
    sd["mod2.block1.convs.bn1.bias"] = np.zeros(64, np.float32)
    sd["mod2.block1.convs.bn1.running_mean"] = np.zeros(64, np.float32)
    sd["mod2.block1.convs.bn1.running_var"] = np.ones(64, np.float32)
    sd["mod2.block1.convs.conv2.weight"] = np.random.randn(64, 64, 3, 3).astype(
        np.float32
    )
    # proj path of stage 3's first block (64→128 stride 2)
    sd["mod3.block1.proj_conv.weight"] = np.random.randn(128, 64, 1, 1).astype(
        np.float32
    )
    return sd


def test_convert_maps_conv_and_norm_tensors():
    import jax

    net = create_network("deeplab", backbone="resnet18", num_classes=4,
                         axis_name=None, crop_size=32)
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        np.zeros((1, 32, 32, 3), np.float32), train=False,
    )
    sd = _fake_abn_resnet18_sd()
    params, stats, n = _convert(sd, variables["params"], variables["batch_stats"])
    assert n >= 7, f"only {n} tensors matched"
    # conv transpose: [out,in,kh,kw] → [kh,kw,in,out]
    np.testing.assert_allclose(
        np.asarray(params["backbone"]["conv1"]["kernel"]),
        np.transpose(sd["mod1.conv1.weight"], (2, 3, 1, 0)),
    )
    # ABN scale = |weight|
    np.testing.assert_allclose(
        np.asarray(params["backbone"]["bn1"]["scale"]),
        np.abs(sd["mod1.bn1.weight"]),
    )
    np.testing.assert_allclose(
        np.asarray(stats["backbone"]["bn1"]["mean"]),
        sd["mod1.bn1.running_mean"],
    )
    np.testing.assert_allclose(
        np.asarray(params["backbone"]["mod3_block1"]["proj_conv"]["kernel"]),
        np.transpose(sd["mod3.block1.proj_conv.weight"], (2, 3, 1, 0)),
    )
