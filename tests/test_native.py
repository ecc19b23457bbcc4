"""Native label-ops library vs numpy fallback parity."""

import numpy as np

from bacs_tpu.data import native


def test_build_succeeds():
    assert native._build_and_load() is not None, "g++ build failed"


def test_class_presence_matches_numpy(rng):
    labels = rng.randint(0, 256, (4, 16, 16)).astype(np.uint8)
    fast = native.class_presence(labels)
    for i in range(4):
        expected = np.zeros(256, bool)
        expected[np.unique(labels[i])] = True
        np.testing.assert_array_equal(fast[i], expected)


def test_remap_matches_table(rng):
    labels = rng.randint(0, 256, (8, 8)).astype(np.uint8)
    table = rng.randint(0, 50, 256).astype(np.int32)
    np.testing.assert_array_equal(native.remap_labels(labels, table), table[labels])


def test_resize_nearest_matches_fallback(rng):
    src = rng.randint(0, 255, (13, 17)).astype(np.uint8)
    fast = native.resize_nearest_u8(src, 7, 5)
    ys = (np.arange(7) * 13 // 7).astype(int)
    xs = (np.arange(5) * 17 // 5).astype(int)
    np.testing.assert_array_equal(fast, src[ys][:, xs])


def test_class_sets_from_presence():
    presence = np.zeros((2, 256), bool)
    presence[0, [0, 3, 255]] = True
    presence[1, [7]] = True
    sets = native.class_sets_from_presence(presence)
    np.testing.assert_array_equal(sets[0], [3])
    np.testing.assert_array_equal(sets[1], [7])
