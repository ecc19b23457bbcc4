"""DecodedCache: memmap cache of canonical decoded samples.

Epochs >= 2 must serve bit-identical (image, label) pairs without touching
the PNG/JPEG decoder (the measured host bottleneck, scripts/bench_input.py).
The reference re-decodes every epoch (reference:
dataloaders/base_datamodule.py:341-377) — this is a framework addition.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.gen_voc_layout import generate

from bacs_tpu.data.datasets import DecodedCache, make_voc_source


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc_cache")
    generate(str(root), n_train=10, n_val=4, size=72, seed=5)
    return str(root)


def _cache(voc_root, tmp_path, split="train", size=64):
    src = make_voc_source(voc_root, split, size)
    return src, DecodedCache(src, str(tmp_path / "cache"))


def test_cache_is_bit_identical_to_source(voc_root, tmp_path):
    src, cached = _cache(voc_root, tmp_path)
    for i in range(len(src)):
        ci, cl = cached.load(i)  # first touch: fill
        si, sl = src.load(i)
        np.testing.assert_array_equal(ci, si)
        np.testing.assert_array_equal(cl, sl)
        ci2, cl2 = cached.load(i)  # second touch: memmap read
        np.testing.assert_array_equal(ci2, si)
        np.testing.assert_array_equal(cl2, sl)


def test_cached_batch_mixes_hits_and_misses(voc_root, tmp_path):
    # fill the hit slots through load_batch too: PIL's and the native
    # decoder's bilinear resizes differ by rounding, and the cache serves
    # whichever path filled a slot first (same as FolderSource's own
    # per-sample PIL patching of failed native decodes)
    src, cached = _cache(voc_root, tmp_path)
    cached.load_batch([1])
    cached.load_batch([3])
    imgs, lbls = cached.load_batch([3, 0, 1, 0])  # dup + hit + miss
    ref = src.load_batch([3, 0, 1, 0])
    if ref is None:  # no native decoder built — PIL path
        ref = tuple(
            np.stack(x) for x in zip(*[src.load(i) for i in (3, 0, 1, 0)])
        )
    np.testing.assert_array_equal(imgs, ref[0])
    np.testing.assert_array_equal(lbls, ref[1])
    assert all(cached._valid[[0, 1, 3]])


def test_second_pass_never_touches_the_decoder(voc_root, tmp_path, monkeypatch):
    src, cached = _cache(voc_root, tmp_path)
    cached.load_batch(list(range(len(src))))  # fill everything

    def boom(*a, **k):
        raise AssertionError("decoder called on a warm cache")

    monkeypatch.setattr(src, "load", boom)
    monkeypatch.setattr(src, "load_batch", boom)
    imgs, lbls = cached.load_batch([0, 2, 4])
    assert imgs.shape == (3, 64, 64, 3) and lbls.shape == (3, 64, 64)


def test_cache_persists_and_rekeys_on_dataset_change(voc_root, tmp_path):
    src, cached = _cache(voc_root, tmp_path)
    cached.load(0)
    # a new instance over the same files reuses the filled slots
    again = DecodedCache(make_voc_source(voc_root, "train", 64),
                         str(tmp_path / "cache"))
    assert again._valid[0] == 1
    # touching a source file re-keys the cache (fresh valid map)
    p = src.image_paths[0]
    os.utime(p, ns=(os.stat(p).st_mtime_ns + 10**9,) * 2)
    rekeyed = DecodedCache(make_voc_source(voc_root, "train", 64),
                           str(tmp_path / "cache"))
    assert rekeyed._valid[0] == 0
    # a different canonical size is a different cache too
    other = DecodedCache(make_voc_source(voc_root, "train", 48),
                         str(tmp_path / "cache"))
    assert other._imgs.shape[1:] == (48, 48, 3)


def test_load_label_stays_full_resolution(voc_root, tmp_path):
    src, cached = _cache(voc_root, tmp_path)
    # class-set scans need the FULL label, not the center-cropped canvas
    np.testing.assert_array_equal(cached.load_label(2), src.load_label(2))
    assert cached.load_label(2).shape != (64, 64) or (
        src.load_label(2).shape == (64, 64)
    )


def test_datamodule_wires_cache_behind_config_key(voc_root, tmp_path):
    from bacs_tpu.data.datamodule import create_datamodule

    config = {
        "dataset": {
            "_target_": "dataloaders.VocDataModule",
            "dataset": {
                "root": voc_root,
                "num_classes": 21,
                "crop_size": 64,
                "cache_decoded": True,
            },
        },
        "training": {"batch_size": 2},
    }
    dm = create_datamodule(config)
    assert isinstance(dm.train_source, DecodedCache)
    # default mode is RAM (plain arrays, not memmaps)
    assert not isinstance(dm.train_source._imgs, np.memmap)
    batch = next(iter(dm.train_batches(epoch=0)))
    assert batch["image"].shape == (2, 64, 64, 3)
    config["dataset"]["dataset"]["cache_decoded"] = "disk"
    dm_disk = create_datamodule(config)
    assert isinstance(dm_disk.train_source._imgs, np.memmap)
    config["dataset"]["dataset"]["cache_decoded"] = False
    dm2 = create_datamodule(config)
    assert not isinstance(dm2.train_source, DecodedCache)


def test_ram_mode_serves_identical_data(voc_root):
    src = make_voc_source(voc_root, "train", 64)
    cached = DecodedCache(src)  # RAM mode
    a = cached.load_batch([0, 2])
    b = src.load_batch([0, 2])
    if b is None:
        b = tuple(np.stack(x) for x in zip(*[src.load(i) for i in (0, 2)]))
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    assert cached._valid[[0, 2]].all() and not cached._valid[1]


def test_disk_commit_flushes_pixels_before_valid_flags(voc_root, tmp_path,
                                                       monkeypatch):
    """Durability ordering: the pixel memmaps must be flushed BEFORE any
    valid flag is set (writeback is not program order — a machine crash
    could otherwise persist valid=1 over never-written pixel pages and the
    cache would silently serve zeros forever)."""
    from bacs_tpu.data.datasets import DecodedCache

    src, cached = _cache(voc_root, tmp_path)
    valid_at_flush = []
    orig_flush = DecodedCache._flush_rows

    def spy(self, mm, indices):
        # spy on the cache's OWN flush method (round-3 advisor finding: the
        # old global np.memmap.flush patch could catch incidental flushes
        # from unrelated memmaps — finalizers, second caches — and flake)
        if self is cached:
            valid_at_flush.append(np.array(cached._valid))
        return orig_flush(self, mm, indices)

    monkeypatch.setattr(DecodedCache, "_flush_rows", spy)
    cached.load_batch([0, 1, 2])
    assert cached._valid[[0, 1, 2]].all()
    # one imgs + one lbls flush per BATCH (not per sample), both taken
    # while every new flag was still 0
    assert len(valid_at_flush) == 2
    for snap in valid_at_flush:
        assert not snap[[0, 1, 2]].any()
    # single-sample path commits too
    valid_at_flush.clear()
    cached.load(5)
    assert cached._valid[5] and len(valid_at_flush) == 2
    assert not any(s[5] for s in valid_at_flush)


def test_flush_row_range_math():
    """_row_runs coalesces consecutive rows, aligns offsets down to mmap
    granularity, clamps to the file end, and merges ranges that touch
    after alignment."""
    import mmap

    from bacs_tpu.data.datasets import DecodedCache

    gran = mmap.ALLOCATIONGRANULARITY
    row = gran * 2 + 128  # deliberately NOT page-aligned
    total = row * 100

    runs = DecodedCache._row_runs([3, 1, 2, 7], row, total)
    # rows 1-3 coalesce into one run, row 7 stands alone
    assert len(runs) == 2
    (lo0, hi0), (lo1, hi1) = runs
    for lo, hi in runs:
        assert lo % gran == 0 and 0 <= lo < hi <= total
    # each run covers its rows' full byte span
    assert lo0 <= 1 * row and hi0 >= 4 * row
    assert lo1 <= 7 * row and hi1 >= 8 * row
    # last row clamps to the file end instead of flushing past it
    (lo, hi), = DecodedCache._row_runs([99], row, total)
    assert hi == total and lo % gran == 0

    # adjacent-after-alignment rows merge instead of overlapping: with
    # row < granularity every row shares pages with its neighbours
    small_row = max(gran // 4, 1)
    runs = DecodedCache._row_runs([0, 1, 2], small_row, small_row * 16)
    assert runs == [(0, 3 * small_row)]
    prev_hi = -1
    for lo, hi in DecodedCache._row_runs([0, 2, 4, 6], small_row,
                                         small_row * 16):
        assert lo >= prev_hi  # non-overlapping, sorted
        prev_hi = hi


def test_disk_cache_flush_persists_rows(voc_root, tmp_path):
    """End-to-end: the dirty-range flush path runs against real memmaps
    (exercising mmap.flush offset/size) and the committed rows reread
    correctly through a fresh mapping of the same files."""
    src, cached = _cache(voc_root, tmp_path)
    a = cached.load_batch([0, 3, 4])
    src2, cached2 = _cache(voc_root, tmp_path)
    assert cached2._valid[[0, 3, 4]].all()
    b = cached2.load_batch([0, 3, 4])
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
