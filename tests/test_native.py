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


def test_unpack_bitplanes_matches_numpy_fallback(rng):
    n, bits, groups, w = 2, 5, 3, 16
    packed = rng.randint(0, 256, (n, bits, groups, w)).astype(np.uint8)
    fast = native.unpack_bitplanes(packed, n, bits, groups, w)
    assert fast is not None
    plane_bits = np.unpackbits(packed, axis=2, bitorder="little")
    ref = np.zeros((n, groups * 8, w), np.uint8)
    for b in range(bits):
        ref |= plane_bits[:, b] << b
    np.testing.assert_array_equal(fast, ref)


def test_class_sets_from_presence():
    presence = np.zeros((2, 256), bool)
    presence[0, [0, 3, 255]] = True
    presence[1, [7]] = True
    sets = native.class_sets_from_presence(presence)
    np.testing.assert_array_equal(sets[0], [3])
    np.testing.assert_array_equal(sets[1], [7])


# ---------------------------------------------------------------------------
# native batch decoder (native/fastdecode.cpp)
# ---------------------------------------------------------------------------


def _write_pair(tmp_path, i, w, h, rng):
    from PIL import Image

    img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
    lbl = rng.randint(0, 21, (h, w)).astype(np.uint8)
    img_p = str(tmp_path / f"img_{i}.jpg")
    lbl_p = str(tmp_path / f"lbl_{i}.png")
    Image.fromarray(img).save(img_p, quality=95)
    # palette PNG like VOC SegmentationClassAug masks
    pal_img = Image.fromarray(lbl, mode="P")
    pal_img.putpalette([c for k in range(256) for c in (k, 0, 0)])
    pal_img.save(lbl_p)
    return img_p, lbl_p


def test_native_decode_batch_matches_pil(tmp_path, rng):
    """Parallel C++ decode vs the PIL reference path: labels must be
    near-identical (nearest conventions agree away from rounding ties);
    images close (JPEG decode + bilinear implementations differ slightly)."""
    from bacs_tpu.data import native_decode
    from bacs_tpu.data.datasets import _load_pair

    if not native_decode.available():
        import pytest

        pytest.skip("native decoder unavailable")
    size = 32
    img_paths, lbl_paths = [], []
    for i, (w, h) in enumerate([(40, 60), (64, 32), (32, 32), (100, 90)]):
        ip, lp = _write_pair(tmp_path, i, w, h, rng)
        img_paths.append(ip)
        lbl_paths.append(lp)
    imgs, lbls, failed = native_decode.decode_batch(img_paths, lbl_paths, size)
    assert not failed.any()
    assert imgs.shape == (4, size, size, 3) and lbls.shape == (4, size, size)
    for i in range(4):
        pil_img, pil_lbl = _load_pair(img_paths[i], lbl_paths[i], size)
        # labels: raw palette indices, geometry-identical resamplers — exact
        np.testing.assert_array_equal(lbls[i], pil_lbl)
        # images: PIL-style triangle resampling matches to rounding (both
        # use libjpeg; the resampler is float vs PIL fixed-point)
        diff = np.abs(imgs[i].astype(int) - pil_img.astype(int))
        assert diff.mean() < 1.5 and diff.max() <= 16, (diff.mean(), diff.max())


def test_native_decode_failure_is_flagged(tmp_path, rng):
    from bacs_tpu.data import native_decode

    if not native_decode.available():
        import pytest

        pytest.skip("native decoder unavailable")
    ip, lp = _write_pair(tmp_path, 0, 40, 40, rng)
    bogus = str(tmp_path / "missing.jpg")
    imgs, lbls, failed = native_decode.decode_batch(
        [ip, bogus], [lp, lp], 16
    )
    assert list(failed) == [False, True]
    assert (imgs[1] == 0).all()


def test_folder_source_load_batch_matches_load(tmp_path, rng):
    """FolderSource.load_batch (native) must agree with .load (PIL) on
    labels after the remap table."""
    from bacs_tpu.data.datasets import FolderSource

    img_paths, lbl_paths = [], []
    for i in range(3):
        ip, lp = _write_pair(tmp_path, i, 48, 36, rng)
        img_paths.append(ip)
        lbl_paths.append(lp)
    src = FolderSource(img_paths, lbl_paths, 24, ["c%d" % i for i in range(21)])
    out = src.load_batch([0, 1, 2])
    if out is None:
        import pytest

        pytest.skip("native decoder unavailable")
    imgs, lbls = out
    for i in range(3):
        _, lbl_pil = src.load(i)
        np.testing.assert_array_equal(lbls[i], lbl_pil)
