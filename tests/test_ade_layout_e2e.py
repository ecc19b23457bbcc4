"""End-to-end through the production tree on a real on-disk ADE20K layout
(companion to tests/test_voc_layout_e2e.py and
tests/test_cityscapes_layout_e2e.py — third dataset family, reference:
dataset/ade20k.py)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.gen_ade_layout import generate

from bacs_tpu.config import load_config
from bacs_tpu.data.datasets import ADE20K_CLASSES, FolderSource


@pytest.fixture(scope="module")
def ade_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ade_layout")
    generate(str(root), n_train=12, n_val=4, size=72, num_classes=151,
             seed=7)
    return str(root)


def test_loader_walks_scenparsing_layout(ade_root):
    from bacs_tpu.data.datasets import make_ade_source

    src = make_ade_source(ade_root, "train", 64)
    assert isinstance(src, FolderSource)
    assert len(src.image_paths) == 12
    assert src.class_names == list(ADE20K_CLASSES)
    img, lbl = src.load(0)
    assert img.shape == (64, 64, 3) and lbl.shape == (64, 64)
    assert lbl.max() < 151


def test_conf_experiments_joint_runs_on_ade_layout(ade_root, tmp_path):
    """The full 151-class head end-to-end on the file-backed path."""
    config = load_config(
        "conf/experiments", "joint", [
            "dataset=ade",
            f"dataset.dataset.root={ade_root}",
            "dataset.dataset.crop_size=48",
            "training.batch_size=4",
            "training.epochs=1",
            "training.mixed_precision=false",
            "+training.n_devices=1",
            "network.backbone=resnet18",
            f"training.ckpt_dir={tmp_path}/ckpt",
        ],
    )
    from bacs_tpu.train.loop import Trainer

    trainer = Trainer(config)
    assert isinstance(trainer.datamodule.train_source, FolderSource)
    assert trainer.datamodule.num_classes == 151
    miou = trainer.fit()
    assert np.isfinite(miou) and 0.0 <= miou <= 1.0
