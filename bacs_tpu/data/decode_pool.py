"""Multi-process host decode pool behind the prefetch interface.

The host input pipeline's ceiling is per-core decode throughput (measured
scripts/bench_input.py: ~112 img/s/core native, 47 img/s end-to-end on the
1-core dev host vs a 227 img/s device step).  Production TPU-VM hosts have
8+ cores; this pool lets N worker processes decode index batches ahead of
the consumer so the chip stays fed (TPU-native replacement for the
reference's DataLoader `num_workers`, reference:
dataloaders/base_datamodule.py:45-54,341-377 — num_workers auto via
sched_getaffinity, prefetch 4).

Design notes:

* **spawn, not fork** — the parent has live C++ decoder threads and a JAX
  runtime by the time streaming starts; forking either is unsafe.  Workers
  are spawned once per DataModule and reused across epochs/tasks.
* **jax-free children** — workers import numpy/PIL (+ the native decoder)
  only; anything JAX stays in the parent, so children never touch the TPU.
* **order-preserving bounded window** — batches are submitted `workers + 2`
  ahead and yielded strictly in submission order, so the batch stream is
  BIT-IDENTICAL to serial decoding for any worker count (guarded by
  tests/test_input_workers.py); a failed decode re-raises at the consumer.

Sources must be picklable (FolderSource / SyntheticSource).  RAM/device
caches are served in-process instead — a child filling its own copy of the
cache would help nobody.
"""

from __future__ import annotations

import os
from collections import deque
from typing import Iterable, Iterator, Sequence, Tuple

import numpy as np

# set by _worker_init in each worker process
_SRC = None


def gather_host(source, indices) -> Tuple[np.ndarray, np.ndarray]:
    """Decode one index batch: native parallel decode when the source
    supports it, per-sample load otherwise."""
    batch = getattr(source, "load_batch", None)
    if batch is not None:
        out = batch([int(i) for i in indices])
        if out is not None:
            return out
    imgs, lbls = [], []
    for i in indices:
        img, lbl = source.load(int(i))
        imgs.append(img)
        lbls.append(lbl)
    return np.stack(imgs), np.stack(lbls)


def _worker_init(source) -> None:
    global _SRC
    # defensive: if anything in the child ever imports jax, keep it off the
    # accelerator (the axon plugin registers regardless of JAX_PLATFORMS)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    _SRC = source


def _worker_gather(indices: Sequence[int]):
    return gather_host(_SRC, indices)


class DecodePool:
    """N spawn-context decode workers with an in-order lookahead window."""

    def __init__(self, source, workers: int):
        assert workers >= 1
        import multiprocessing as mp

        self.workers = workers
        ctx = mp.get_context("spawn")
        self._pool = ctx.Pool(
            workers, initializer=_worker_init, initargs=(source,)
        )

    def stream(
        self, index_batches: Iterable[Sequence[int]]
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        window: deque = deque()
        depth = self.workers + 2
        try:
            for idx in index_batches:
                window.append(
                    self._pool.apply_async(
                        _worker_gather, ([int(i) for i in idx],)
                    )
                )
                if len(window) >= depth:
                    yield window.popleft().get()
            while window:
                yield window.popleft().get()
        except GeneratorExit:
            # consumer abandoned the epoch; drop pending results
            while window:
                window.popleft()
            raise

    def close(self) -> None:
        if self._pool is not None:
            self._pool.terminate()
            self._pool.join()
            self._pool = None

    def __del__(self):  # best-effort cleanup
        try:
            self.close()
        except Exception:
            pass


def pool_eligible(source) -> bool:
    """Caches are in-process by design; everything else can ship to
    workers (path-list and synthetic sources are cheaply picklable)."""
    from bacs_tpu.data.datasets import DecodedCache, DeviceCache

    return not isinstance(source, (DecodedCache, DeviceCache))
