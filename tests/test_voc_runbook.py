"""Real-VOC runbook validation (scripts/voc_runbook.py).

Builds the reference's REAL ResNet-101 (inplace_abn naming via the parity
shim), saves its state_dict byte-for-byte in the PLOP iabn_sync release
format ({"state_dict": {"module.<k>": tensor}} incl. classifier.fc entries,
reference: networks/resnet.py:432-488), and drives every runbook stage:
layout validation, checkpoint-format validation, and conversion coverage
into the Flax DeepLabV3.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts import voc_runbook  # noqa: E402
from scripts.gen_voc_layout import generate  # noqa: E402

pytestmark = pytest.mark.parity  # builds the torch reference's ResNet


@pytest.fixture(scope="module")
def plop_ckpt(tmp_path_factory):
    """A checkpoint with the reference's EXACT key names in the PLOP
    release layout, built from the reference's own ResNet code."""
    from functools import partial

    from tests.reference_shim import load_reference_networks

    networks = load_reference_networks()
    import inplace_abn  # the shim registered this

    resnet_mod = sys.modules[networks.ResNet.__module__] if hasattr(
        networks, "ResNet") else None
    if resnet_mod is None or not hasattr(resnet_mod, "create_resnet"):
        import importlib

        resnet_mod = importlib.import_module("networks.resnet")
    model = resnet_mod.create_resnet(
        "resnet101", norm_act=partial(inplace_abn.ABN, activation="leaky_relu"),
        output_stride=16, pretrained=False,
    )
    sd = {}
    rng = np.random.RandomState(0)
    for k, v in model.state_dict().items():
        t = torch.as_tensor(
            rng.randn(*v.shape).astype(np.float32) * 0.05
            if v.dtype.is_floating_point else np.zeros(v.shape, np.int64)
        )
        sd[f"module.{k}"] = t
    # the real release carries the ImageNet fc head, dropped on load
    # (reference: networks/resnet.py:478-480)
    sd["module.classifier.fc.weight"] = torch.zeros(1000, 2048)
    sd["module.classifier.fc.bias"] = torch.zeros(1000)
    path = tmp_path_factory.mktemp("ckpt") / "resnet101_iabn_sync.pth.tar"
    torch.save({"state_dict": sd}, path)
    return str(path)


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("voc"))
    generate(root, n_train=12, n_val=4, size=96)
    return root


def test_check_data_passes_on_valid_tree(voc_root, capsys):
    out = voc_runbook.check_data(voc_root)
    assert out == {"train": 12, "val": 4}
    assert "[ok]" in capsys.readouterr().out


def test_check_data_fails_actionably(tmp_path):
    with pytest.raises(voc_runbook.StageError, match="VOCtrainval"):
        voc_runbook.check_data(str(tmp_path))
    # tree without the aug masks
    voc = tmp_path / "VOCdevkit" / "VOC2012" / "JPEGImages"
    voc.mkdir(parents=True)
    with pytest.raises(voc_runbook.StageError, match="SegmentationClassAug"):
        voc_runbook.check_data(str(tmp_path))


def test_check_backbone_validates_plop_format(plop_ckpt, tmp_path):
    out = voc_runbook.check_backbone(plop_ckpt)
    assert out["n_fc"] == 2
    assert out["n_tensors"] == 522  # RN101: 104 convs + 104 ABNs × 4 + fc
    # a bare state dict (not the release wrapper) must be rejected
    bare = tmp_path / "bare.pth"
    torch.save({"conv1.weight": torch.zeros(2, 2)}, bare)
    with pytest.raises(voc_runbook.StageError, match="state_dict"):
        voc_runbook.check_backbone(str(bare))
    # wrapper but wrong naming scheme
    wrong = tmp_path / "wrong.pth.tar"
    torch.save({"state_dict": {"module.layer1.0.conv1.weight":
                               torch.zeros(2, 2)}}, wrong)
    with pytest.raises(voc_runbook.StageError, match="mod1"):
        voc_runbook.check_backbone(str(wrong))


def test_check_convert_covers_backbone(plop_ckpt):
    out = voc_runbook.check_convert(plop_ckpt, "resnet101")
    assert out["converted"] >= 0.9 * out["expected"]


def test_runbook_main_end_to_end(voc_root, plop_ckpt, capsys):
    rc = voc_runbook.main([
        "--root", voc_root, "--backbone-ckpt", plop_ckpt,
    ])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "main.py" in out and "backbone_weights_path" in out
