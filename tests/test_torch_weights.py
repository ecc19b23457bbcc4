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


def _leaf_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _leaf_paths(v, prefix + (k,))
    else:
        yield prefix, tree


def test_release_export_roundtrip_maps_every_tensor(tmp_path):
    """VERDICT r4 next #5: the release-format exporter writes the EXACT
    layout the reference consumes (module.-prefixed state_dict with a
    classifier fc), and load_pretrained_backbone recovers EVERY backbone
    tensor from it (bijective round trip, up to the ABN |weight| rule)."""
    import jax

    from bacs_tpu.utils.torch_weights import (
        export_backbone_release, load_pretrained_backbone)

    net = create_network("deeplab", backbone="resnet18", num_classes=4,
                         axis_name=None, crop_size=32)
    rng = {"params": jax.random.PRNGKey(3), "dropout": jax.random.PRNGKey(4)}
    variables = net.init(rng, np.zeros((1, 32, 32, 3), np.float32),
                         train=False)
    # perturb so "loaded" is distinguishable from "left at init": re-init
    # with a different key gives a distinct target tree
    v2 = net.init({"params": jax.random.PRNGKey(9),
                   "dropout": jax.random.PRNGKey(10)},
                  np.zeros((1, 32, 32, 3), np.float32), train=False)

    path = str(tmp_path / "resnet18_iabn_sync.pth.tar")
    n_written = export_backbone_release(variables, path)

    # format exactness: module.-prefixed, classifier fc present, .convs.
    raw = torch.load(path, map_location="cpu", weights_only=False)
    keys = list(raw["state_dict"].keys())
    assert all(k.startswith("module.") for k in keys)
    assert "module.classifier.fc.weight" in keys
    assert "module.mod1.conv1.weight" in keys
    assert any(".convs.conv1.weight" in k for k in keys)
    n_leaves = sum(1 for _ in _leaf_paths(variables["params"]["backbone"]))
    n_stats = sum(1 for _ in _leaf_paths(variables["batch_stats"]["backbone"]))
    assert n_written == n_leaves + n_stats  # every backbone tensor exported

    params, stats, n_loaded = load_pretrained_backbone(path, v2)
    assert n_loaded == n_written  # every exported tensor mapped back
    for path_p, leaf in _leaf_paths(params["backbone"]):
        src = variables["params"]["backbone"]
        for p in path_p:
            src = src[p]
        expect = np.abs(src) if path_p[-1] == "scale" else np.asarray(src)
        np.testing.assert_allclose(np.asarray(leaf), expect, rtol=1e-6,
                                   err_msg="/".join(path_p))
    for path_s, leaf in _leaf_paths(stats["backbone"]):
        src = variables["batch_stats"]["backbone"]
        for p in path_s:
            src = src[p]
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(src),
                                   rtol=1e-6, err_msg="/".join(path_s))


def test_release_export_roundtrip_resnet101_bottleneck(tmp_path):
    """Same bijectivity on the production arch (bottleneck blocks with
    conv3/proj paths; reference recipe backbone resnet101)."""
    import jax

    from bacs_tpu.utils.torch_weights import (
        export_backbone_release, load_pretrained_backbone)

    net = create_network("deeplab", backbone="resnet101", num_classes=4,
                         axis_name=None, crop_size=32)
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        np.zeros((1, 32, 32, 3), np.float32), train=False)
    path = str(tmp_path / "resnet101_iabn_sync.pth.tar")
    n_written = export_backbone_release(variables, path)
    n_leaves = sum(1 for _ in _leaf_paths(variables["params"]["backbone"]))
    n_stats = sum(1 for _ in _leaf_paths(variables["batch_stats"]["backbone"]))
    assert n_written == n_leaves + n_stats
    _, _, n_loaded = load_pretrained_backbone(path, variables)
    assert n_loaded == n_written
