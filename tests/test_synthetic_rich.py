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


def test_cooccur_era_structure_and_rate():
    """Era mode (VERDICT r4 next #2): each image carries exactly one era's
    new classes (its anchor's), and `cooccur` controls how often old-era
    instances are planted inside new-era images (collapsed to background at
    train time → true background shift)."""
    def stats(rate):
        src = SyntheticSource(300, 48, 21, seed=9, style="rich",
                              cooccur=rate, cooccur_initial=15)
        n_new, n_with_old = 0, 0
        for i in range(300):
            cs = sorted(set(int(c) for c in np.unique(src.load_label(i)))
                        - {0})
            if not cs:
                continue
            m = cs[-1]
            if m > 15:
                # one era per image: every other class predates m's era
                assert all(c < m for c in cs[:-1]), cs
                n_new += 1
                n_with_old += any(c <= 15 for c in cs[:-1])
        return n_new, n_with_old

    n0, w0 = stats(0.0)
    n9, w9 = stats(0.95)
    assert n0 > 40 and n9 > 40  # new-era images are plentiful
    assert w0 == 0              # rate 0: no base-era instances planted
    assert w9 > 0.6 * n9        # rate .95: most new-era images carry them


def test_cooccur_disjoint_split_is_era_exact():
    """In disjoint membership mode the era structure gives each task
    exactly its own era's images — old-class pixels inside new-task images
    are allowed (they're `old`), future classes exclude."""
    from bacs_tpu.data.continual import ContinualScenario, compute_class_sets

    src = SyntheticSource(120, 48, 21, seed=4, style="rich",
                          cooccur=0.8, cooccur_initial=15)
    sets = compute_class_sets(
        lambda i=i: src.load_label(i) for i in range(120))
    sc = ContinualScenario(sets, initial_increment=15, increment=1,
                           num_classes=21, mode="disjoint")
    all_idx = []
    for t in range(6):
        idx = sc.task_indices(t)
        all_idx += list(idx)
        for i in idx:
            cs = set(int(c) for c in sets[i])
            m = max(cs)
            era = 0 if m <= 15 else m - 15
            assert era == t, (i, cs, t)
    # every image with >=1 class lands in exactly one task
    n_nonempty = sum(1 for s in sets if len(s))
    assert len(all_idx) == len(set(all_idx)) == n_nonempty


def test_bg_drift_shifts_new_era_background_appearance():
    """With bg_drift, era>0 background pixels have a distribution era 0
    never produced (channel gain/bias + high-frequency hatch); without it,
    backgrounds are era-independent."""
    def bg_means(drift):
        """Per-era mean background color (the drift is FIXED per era, so
        pooling eras would average distinct shifts toward neutral)."""
        src = SyntheticSource(400, 48, 21, seed=11, style="rich",
                              cooccur=0.5, cooccur_initial=15,
                              bg_drift=drift)
        acc = {}
        for i in range(400):
            img, lbl = src.load(i)
            cs = set(int(c) for c in np.unique(lbl)) - {0}
            if not cs:
                continue
            era = max(0, max(cs) - 15)
            bg = img[lbl == 0]
            if len(bg) > 100:
                acc.setdefault(era, []).append(bg.mean(axis=0))
        return {e: np.mean(v, axis=0) for e, v in acc.items() if len(v) >= 3}

    raw = bg_means(False)
    dr = bg_means(True)
    new_eras = [e for e in raw if e > 0 and e in dr]
    assert len(new_eras) >= 3  # several new eras observed in both modes
    # no drift: every era's background matches era 0's
    assert max(np.linalg.norm(raw[e] - raw[0]) for e in new_eras) < 12.0
    # drift: at least one era strongly shifted, most shift well past noise
    shifts = [np.linalg.norm(dr[e] - dr[0]) for e in new_eras]
    assert max(shifts) > 40.0
    assert np.median(shifts) > 20.0
    # era-0 backgrounds are untouched by the knob
    assert np.linalg.norm(raw[0] - dr[0]) < 6.0


def test_datamodule_cooccur_plumbing():
    from bacs_tpu.data.datamodule import create_datamodule

    cfg = {
        "dataset": {
            "_target_": "dataloaders.SyntheticDataModule",
            "dataset": {
                "num_classes": 21, "crop_size": 32, "n_train": 8,
                "n_val": 4, "style": "rich", "cooccur": 0.7,
                "bg_drift": True,
            },
        },
        "training": {
            "batch_size": 4, "initial_increment": 15, "increment": 1,
            "mode": "disjoint", "seed": 0, "debug": False,
        },
    }
    dm = create_datamodule(cfg)
    for src in (dm.train_source, dm.val_source):
        assert src.cooccur == 0.7 and src.bg_drift
        assert src.cooccur_initial == 15 and src.cooccur_increment == 1


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
