"""End-to-end through the production trees on a real on-disk Cityscapes
layout (companion to tests/test_voc_layout_e2e.py for the third dataset
family — reference: dataset/cityscape_dataset.py + the authenticated
download our data/download.py gates offline).

scripts/gen_cityscapes_layout.py writes `leftImg8bit/{split}/{city}` +
`gtFine` label PNGs carrying RAW Cityscapes ids, so this exercises the
loader's id→trainid remap, the multi-city directory walk, and the
domain-shift scenario (cities = domains) on the file-backed path.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.gen_cityscapes_layout import generate

from bacs_tpu.config import load_config
from bacs_tpu.data.datasets import CITYSCAPES_ID_TO_TRAINID, FolderSource


@pytest.fixture(scope="module")
def cs_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cs_layout")
    generate(str(root), cities=2, per_city=8, val_cities=1, val_per_city=4,
             size=72, seed=5)
    return str(root)


def test_loader_remaps_raw_ids_and_walks_cities(cs_root):
    from bacs_tpu.data.datasets import make_cityscapes_source

    src = make_cityscapes_source(cs_root, "train", 64)
    assert isinstance(src, FolderSource)
    assert len(src.image_paths) == 16
    assert sorted(set(src.domain_ids)) == [0, 1]  # two cities
    _, lbl = src.load(0)
    # raw ids (7, 8, 11, ...) were remapped to train ids 0..19
    assert set(np.unique(lbl)) <= set(range(20))
    assert set(np.unique(lbl)) & set(CITYSCAPES_ID_TO_TRAINID.values())


def test_conf_experiments_joint_runs_on_cityscapes_layout(cs_root, tmp_path):
    config = load_config(
        "conf/experiments", "joint", [
            "dataset=cityscape",
            f"dataset.dataset.root={cs_root}",
            "dataset.dataset.num_classes=20",
            "dataset.dataset.crop_size=48",
            "training.batch_size=4",
            "training.epochs=4",
            "training.mixed_precision=false",
            "+training.n_devices=1",
            "network.backbone=resnet18",
            f"training.ckpt_dir={tmp_path}/ckpt",
        ],
    )
    from bacs_tpu.train.loop import Trainer

    trainer = Trainer(config)
    assert isinstance(trainer.datamodule.train_source, FolderSource)
    miou = trainer.fit()
    assert np.isfinite(miou) and 0.0 <= miou <= 1.0


def test_domain_shift_cities_become_tasks(cs_root, tmp_path):
    """Domain-incremental: 2 cities → 2 tasks, full label space per task
    (reference: cityscape_datamodule.py:270-295 DomainScenario)."""
    config = load_config(
        "conf/experiments", "joint", [
            "dataset=cityscape",
            f"dataset.dataset.root={cs_root}",
            "dataset.dataset.num_classes=20",
            "dataset.dataset.crop_size=48",
            "+dataset.dataset.n_cities=2",  # 2 domain-tasks (1 city each)
            "training.batch_size=4",
            "training.epochs=1",
            "training.mixed_precision=false",
            "+training.n_devices=1",
            "network.backbone=resnet18",
            f"training.ckpt_dir={tmp_path}/ckpt2",
        ],
    )
    from bacs_tpu.train.loop import Trainer

    trainer = Trainer(config)
    assert trainer.datamodule.domain_shift
    assert trainer.n_tasks == 2
    miou = trainer.fit()
    assert np.isfinite(miou) and 0.0 <= miou <= 1.0
