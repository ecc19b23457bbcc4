"""Multi-process decode pool (bacs_tpu/data/decode_pool.py).

The pool must be a pure throughput lever: any worker count yields the
BIT-IDENTICAL batch stream (train + eval, incl. tail padding), and worker
failures surface at the consumer.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.gen_voc_layout import generate  # noqa: E402

from bacs_tpu.data.datamodule import DataModule  # noqa: E402
from bacs_tpu.data.datasets import SyntheticSource, make_voc_source  # noqa: E402
from bacs_tpu.data.decode_pool import DecodePool, gather_host, pool_eligible  # noqa: E402


@pytest.fixture(scope="module")
def voc_source(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("voc"))
    generate(root, n_train=10, n_val=4, size=48)
    return make_voc_source(root, "train", 48)


@pytest.fixture(scope="module")
def pool(voc_source):
    p = DecodePool(voc_source, workers=2)
    yield p
    p.close()


def test_pool_stream_matches_serial(voc_source, pool):
    idx_batches = [[0, 3, 1], [2, 2, 4], [9, 8, 7], [5, 6, 0], [1, 2, 3]]
    serial = [gather_host(voc_source, idx) for idx in idx_batches]
    pooled = list(pool.stream(idx_batches))
    assert len(pooled) == len(serial)
    for (si, sl), (pi, pl) in zip(serial, pooled):
        np.testing.assert_array_equal(si, pi)
        np.testing.assert_array_equal(sl, pl)


def test_pool_reusable_across_epochs(voc_source, pool):
    for _ in range(2):
        out = list(pool.stream([[0, 1], [2, 3]]))
        assert out[0][0].shape == (2, 48, 48, 3)


def test_worker_count_does_not_change_datamodule_stream(voc_source):
    def batches(workers):
        dm = DataModule(
            voc_source, voc_source, num_classes=21, crop_size=32,
            batch_size=4, initial_increment=0, increment=0, seed=7,
            input_workers=workers,
        )
        try:
            train = [
                {k: np.asarray(v) for k, v in b.items()}
                for b in dm.train_batches(epoch=1)
            ]
            evals = [
                {k: np.asarray(v) for k, v in b.items()}
                for b in dm.eval_batches(0)
            ]
        finally:
            dm.close()
        return train, evals

    t0, e0 = batches(0)
    t2, e2 = batches(2)
    assert len(t0) == len(t2) and len(e0) == len(e2)
    for a, b in zip(t0 + e0, t2 + e2):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_worker_exception_reraises():
    src = _Exploding(6)
    pool = DecodePool(src, workers=2)
    try:
        with pytest.raises(Exception, match="boom"):
            list(pool.stream([[0], [5]]))
    finally:
        pool.close()


class _Exploding:
    """Picklable source that fails on index 5."""

    def __init__(self, n):
        self.n = n
        self.size = 8
        self.class_names = ["background"]

    def __len__(self):
        return self.n

    def load(self, i):
        if i == 5:
            raise RuntimeError("boom")
        return (np.zeros((8, 8, 3), np.uint8), np.zeros((8, 8), np.uint8))


def test_pool_eligibility_gates_caches():
    from bacs_tpu.data.datasets import DecodedCache, DeviceCache

    src = SyntheticSource(4, 16, 3)
    assert pool_eligible(src)
    assert not pool_eligible(DeviceCache(src))
    assert not pool_eligible(DecodedCache(src))
