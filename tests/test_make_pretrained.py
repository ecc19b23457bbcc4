"""End-to-end warm-start pipeline (VERDICT r4 next #5).

joint pre-run → export_backbone_release (exact reference release layout,
networks/resnet.py:455-488) → a fresh Trainer consumes it through
`network.backbone_weights_path` (loop.py pretrained path), at micro scale.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_make_pretrained_backbone_script_and_warm_start(tmp_path, monkeypatch):
    out = str(tmp_path / "bb" / "rn18_rich.pth.tar")
    monkeypatch.setattr(sys, "argv", [
        "make_pretrained_backbone.py", "--out", out,
        "--backbone", "resnet18", "--crop", "32", "--epochs", "1",
        "--n-train", "8", "--n-classes", "6", "--batch", "4",
    ])
    import make_pretrained_backbone

    make_pretrained_backbone.main()
    assert os.path.isfile(out)

    # a continual Trainer warm-starts from it: backbone == exported weights
    from bacs_tpu.config import load_config
    from bacs_tpu.train.loop import Trainer
    from bacs_tpu.utils.torch_weights import load_torch_state_dict

    config = load_config(
        "conf/continual_debug", "config",
        [
            "network=deep_lab", "network.backbone=resnet18",
            f"+network.backbone_weights_path={out}",
            "dataset.dataset.num_classes=4",
            "dataset.dataset.crop_size=32",
            "training.initial_increment=3", "training.increment=1",
            # 0 train steps: fit() runs surgery/eval but leaves the
            # backbone exactly as the pretrained path initialized it
            "training.epochs=0",
        ],
    )
    trainer = Trainer(config)
    trainer.fit()
    sd = load_torch_state_dict(out)
    got = np.asarray(
        trainer.state.params["backbone"]["conv1"]["kernel"])
    want = np.transpose(sd["mod1.conv1.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    got_scale = np.asarray(
        trainer.state.params["backbone"]["bn1"]["scale"])
    np.testing.assert_allclose(got_scale, np.abs(sd["mod1.bn1.weight"]),
                               rtol=1e-6)
    # running stats came through too (the joint pre-run moved them off init)
    got_mean = np.asarray(
        trainer.state.batch_stats["backbone"]["bn1"]["mean"])
    np.testing.assert_allclose(got_mean, sd["mod1.bn1.running_mean"],
                               rtol=1e-6)
    assert np.abs(got_mean).max() > 0  # not the fresh-init zeros
