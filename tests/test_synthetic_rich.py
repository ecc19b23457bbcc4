"""Rich synthetic generator + HBM-resident DeviceCache (flagship protocol).

The `rich` style gives every class a distinctive texture+color appearance
so FLAGSHIP-scale models get real signal (VERDICT r3: the flat generator
collapsed DeepLab CL runs); DeviceCache keeps the whole decoded set on
device so batches are gathered without per-batch host→device uploads.
"""

from __future__ import annotations

import jax
import numpy as np

from bacs_tpu.data.datasets import DeviceCache, SyntheticSource


def test_rich_is_deterministic_and_valid():
    a = SyntheticSource(4, 96, 21, seed=3, style="rich")
    b = SyntheticSource(4, 96, 21, seed=3, style="rich")
    for i in range(4):
        ia, la = a.load(i)
        ib, lb = b.load(i)
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(la, lb)
        assert ia.dtype == np.uint8 and la.dtype == np.uint8
        assert la.max() < 21


def test_rich_classes_have_distinct_appearance():
    """Per-class pixel statistics must be separable — mean colors of two
    different classes differ far more than two instances of one class."""
    src = SyntheticSource(64, 96, 6, seed=5, style="rich")
    sums = np.zeros((6, 3))
    counts = np.zeros(6)
    per_instance = {c: [] for c in range(1, 6)}
    for i in range(64):
        img, lbl = src.load(i)
        for c in range(1, 6):
            m = lbl == c
            if m.sum() > 50:
                mean = img[m].mean(axis=0)
                sums[c] += mean
                counts[c] += 1
                per_instance[c].append(mean)
    means = sums[1:] / np.maximum(counts[1:, None], 1)
    # across-class spread
    d_across = np.linalg.norm(means[:, None] - means[None, :], axis=-1)
    across = d_across[np.triu_indices(5, 1)].mean()
    # within-class spread
    within = np.mean([
        np.linalg.norm(np.asarray(v) - np.asarray(v).mean(0), axis=-1).mean()
        for v in per_instance.values() if len(v) >= 2
    ])
    assert across > 1.5 * within, (across, within)


def test_rich_flat_styles_differ_but_flat_unchanged():
    """`flat` must stay bit-identical to the original generator (every
    existing protocol table/test is pinned to it)."""
    flat = SyntheticSource(2, 48, 6, seed=1)  # default style
    img, lbl = flat.load(0)
    # regression pin: original generator's first sample (seed 1)
    rng = np.random.RandomState(1 * 100003 + 0)
    s = 48
    exp = np.zeros((s, s), np.uint8)
    n_obj = rng.randint(1, 5)
    for c in rng.randint(1, 6, size=n_obj):
        cx, cy = rng.randint(0, s, 2)
        r = rng.randint(s // 8, s // 3)
        yy, xx = np.ogrid[:s, :s]
        exp[(yy - cy) ** 2 + (xx - cx) ** 2 < r * r] = c
    np.testing.assert_array_equal(lbl, exp)


def test_device_cache_matches_source_and_lives_on_device():
    src = SyntheticSource(6, 32, 5, seed=2, style="rich")
    dc = DeviceCache(src)
    assert len(dc) == 6 and dc.size == 32
    imgs, lbls = dc.load_batch([0, 4, 2])
    assert isinstance(imgs, jax.Array) and isinstance(lbls, jax.Array)
    for k, i in enumerate([0, 4, 2]):
        im, lb = src.load(i)
        np.testing.assert_array_equal(np.asarray(imgs[k]), im)
        np.testing.assert_array_equal(np.asarray(lbls[k]), lb)
    # full-res labels pass through uncached
    np.testing.assert_array_equal(dc.load_label(3), src.load_label(3))


def test_datamodule_device_cache_end_to_end():
    """A continual DataModule over a device-cached rich source yields
    augmented device batches and padded eval batches."""
    from bacs_tpu.data.datamodule import create_datamodule

    cfg = {
        "dataset": {
            "_target_": "dataloaders.SyntheticDataModule",
            "dataset": {
                "num_classes": 6, "crop_size": 32, "n_train": 12,
                "n_val": 5, "style": "rich", "cache_decoded": "device",
            },
        },
        "training": {
            "batch_size": 4, "initial_increment": 3, "increment": 1,
            "mode": "overlap", "seed": 0, "debug": False,
        },
    }
    dm = create_datamodule(cfg)
    assert isinstance(dm.train_source, DeviceCache)
    batches = list(dm.train_batches(epoch=0))
    assert batches and batches[0]["image"].shape[1:] == (32, 32, 3)
    assert batches[0]["image"].dtype == np.float32
    evals = list(dm.eval_batches(0))
    # padded tail labels masked to 255
    last = evals[-1]
    n_real = last["n_real"]
    if n_real < last["label"].shape[0]:
        assert np.all(np.asarray(last["label"][n_real:]) == 255)
