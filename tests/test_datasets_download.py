"""Dataset sources: real class names, download gating, synthetic layouts."""

import os

import numpy as np
import pytest
from PIL import Image

from bacs_tpu.data.datasets import (
    ADE20K_CLASSES,
    CITYSCAPES_CLASSES,
    VOC_CLASSES,
    make_voc_source,
)
from bacs_tpu.data.download import DownloadError, _fetch, download_voc


def test_class_name_tables_match_reference_metadata():
    """Per-class IoU metric keys use the reference's published label names
    (reference: dataset/ade20k.py:56-208, dataset/cityscape_dataset.py:50-72)."""
    assert len(VOC_CLASSES) == 21 and VOC_CLASSES[15] == "person"
    assert len(ADE20K_CLASSES) == 151
    assert ADE20K_CLASSES[1] == "wall"
    assert ADE20K_CLASSES[13] == "person"
    assert ADE20K_CLASSES[150] == "flag"
    assert len(CITYSCAPES_CLASSES) == 20
    assert CITYSCAPES_CLASSES[1] == "road" and CITYSCAPES_CLASSES[19] == "bicycle"


def test_fetch_gates_cleanly_offline(tmp_path):
    """No egress → DownloadError with layout instructions, not a raw crash."""
    with pytest.raises(DownloadError, match="layout"):
        _fetch("http://203.0.113.1/nonexistent.tar", str(tmp_path / "x.tar"))


def test_download_voc_skips_complete_layout(tmp_path):
    """An already-materialized layout is detected and no network is touched
    — and make_voc_source consumes exactly the layout download_voc builds."""
    voc_root = tmp_path / "VOCdevkit" / "VOC2012"
    (voc_root / "JPEGImages").mkdir(parents=True)
    (voc_root / "SegmentationClassAug").mkdir()
    seg = voc_root / "ImageSets" / "Segmentation"
    seg.mkdir(parents=True)
    (seg / "train_aug.txt").write_text("sample_000\n")
    (seg / "val.txt").write_text("sample_000\n")
    (voc_root / "SegmentationClass").mkdir()
    img = Image.fromarray(np.zeros((32, 32, 3), np.uint8))
    lbl = Image.fromarray(np.zeros((32, 32), np.uint8))
    img.save(voc_root / "JPEGImages" / "sample_000.jpg")
    lbl.save(voc_root / "SegmentationClassAug" / "sample_000.png")
    lbl.save(voc_root / "SegmentationClass" / "sample_000.png")

    assert download_voc(str(tmp_path)) == str(voc_root)  # no network touched
    src = make_voc_source(str(tmp_path), "train", 32)
    assert len(src) == 1
    im, lb = src.load(0)
    assert im.shape == (32, 32, 3) and lb.shape == (32, 32)
    assert os.path.basename(src.label_paths[0]) == "sample_000.png"
