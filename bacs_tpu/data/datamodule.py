"""DataModule: CL-aware train/val/test batch streams with device transforms.

Host decode overlaps device compute via a one-slot background prefetch
thread (`_prefetch`) — the single-core host's PIL decodes run while the TPU
chews the previous batch (replacing the reference's num_workers DataLoader
processes, base_datamodule.py:45-54).

Functional equivalent of the reference's LightningDataModule stack
(reference: dataloaders/base_datamodule.py:22-469): task state, debug/sweep
subsetting, per-task train loaders, and eval loaders over tasks 0..t with
"with_prev_tasks" label semantics.  Batches are yielded as device dicts
{image, label} produced by the fused on-device transform.
"""

from __future__ import annotations

import math
from typing import Dict, Iterator, List, Optional

import jax
import numpy as np

from bacs_tpu.data.continual import (
    ContinualScenario,
    DomainScenario,
    compute_class_sets,
    shuffle_class_order,
)
from bacs_tpu.data import transforms
from bacs_tpu.data.datasets import (
    DomainShiftedSource,
    SyntheticSource,
    make_ade_source,
    make_cityscapes_source,
    make_voc_source,
)


def _prefetch(iterator, depth: int = 2):
    """Run `iterator` in a daemon thread, keeping `depth` items ready.

    Worker exceptions re-raise at the consumer (a failed decode must not
    silently truncate the epoch).  Abandoning the generator early (break /
    exception in the consumer) sets `stop`, so the worker exits instead of
    blocking forever on a full queue holding decoded batches."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    stop = threading.Event()

    def put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterator:
                if not put(item):
                    return
            put(sentinel)
        except BaseException as e:  # noqa: BLE001 — relayed to consumer
            put(e)

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


class DataModule:
    def __init__(
        self,
        train_source,
        val_source,
        num_classes: int,
        crop_size: int = 512,
        batch_size: int = 8,
        initial_increment: int = 0,
        increment: int = 0,
        mode: str = "overlap",
        shuffle_classes: bool = False,
        seed: int = 42,
        debug: bool = False,
        sweep: bool = False,
        cache_dir: Optional[str] = None,
        test_source=None,
        domain_ids=None,
        n_domains_per_task: int = 1,
        input_workers: int = 0,
    ):
        self.train_source = train_source
        self.val_source = val_source
        self.test_source = test_source
        self.num_classes = num_classes
        self.crop_size = crop_size
        self.batch_size = batch_size
        self.debug = debug
        self.sweep = sweep
        self.seed = seed
        self.task_id = 0
        # multi-process decode pool (reference num_workers semantics,
        # base_datamodule.py:45-54); engages at >=2 on pool-eligible sources
        self.input_workers = int(input_workers or 0)
        self._pools: Dict[int, object] = {}
        # multihost: every process sees the same deterministic global batch
        # plan; `process_shard=True` streams (the jitted step loops) yield
        # only this process's contiguous slice of each global batch, which
        # put_batch reassembles into one global array
        # (train/step.py make_array_from_process_local_data)
        self.process_index = jax.process_index()
        self.process_count = jax.process_count()
        # domain-incremental mode (reference: cityscape_datamodule.py:270-295)
        self.domain_shift = domain_ids is not None
        # continual detection (reference: base_datamodule.py:37-40)
        self.continual = (
            0 < initial_increment < num_classes - 1
        ) or self.domain_shift
        class_order = (
            shuffle_class_order(num_classes, seed) if shuffle_classes else None
        )
        if self.domain_shift:
            scenario = DomainScenario(
                domain_ids, num_classes, n_domains_per_task, seed=seed
            )
            self.train_scenario = scenario
            self.val_scenario = scenario
            self.n_tasks = scenario.n_tasks
        elif self.continual:
            import os

            def _sets(source, tag):
                cache = (
                    os.path.join(cache_dir, f"class_sets_{tag}.npz")
                    if cache_dir
                    else None
                )
                return compute_class_sets(
                    (lambda i=i: source.load_label(i) for i in range(len(source))),
                    cache,
                )

            self.train_scenario = ContinualScenario(
                _sets(train_source, "train"),
                initial_increment,
                increment,
                num_classes,
                mode=mode,
                class_order=class_order,
            )
            # eval scenario always uses overlap membership
            # (reference: base_datamodule.py:278-306 "with_prev_tasks")
            self.val_scenario = ContinualScenario(
                _sets(val_source, "val"),
                initial_increment,
                increment,
                num_classes,
                mode="overlap",
                class_order=class_order,
            )
            self.n_tasks = self.train_scenario.n_tasks
        else:
            self.train_scenario = None
            self.val_scenario = None
            self.n_tasks = 1

    # ------------------------------------------------------------------

    def set_task_id(self, task_id: int):
        self.task_id = task_id

    def get_n_classes(self) -> int:
        return self.num_classes

    @property
    def class_names(self):
        return getattr(self.train_source, "class_names", None)

    def n_classes_at(self, task_id: int) -> int:
        if not self.continual:
            return self.num_classes
        return self.train_scenario.n_classes_at(task_id)

    def _subset(self, indices: np.ndarray, rng: np.random.RandomState):
        """debug → 6 random samples; sweep → 10%
        (reference: base_datamodule.py:331-339)."""
        if self.debug:
            take = min(6, len(indices))
            return rng.choice(indices, size=take, replace=False)
        if self.sweep:
            take = max(1, int(0.1 * len(indices)))
            return rng.choice(indices, size=take, replace=False)
        return indices

    def train_indices(self, task_id: Optional[int] = None) -> np.ndarray:
        t = self.task_id if task_id is None else task_id
        if self.continual:
            idx = self.train_scenario.task_indices(t)
        else:
            idx = np.arange(len(self.train_source))
        return self._subset(idx, np.random.RandomState(self.seed + t))

    def steps_per_epoch(self, n_devices: int = 1) -> int:
        n = len(self.train_indices())
        global_batch = self.batch_size * n_devices
        return max(1, n // max(global_batch, 1))

    # ------------------------------------------------------------------

    def _gather(self, source, indices) -> Dict[str, np.ndarray]:
        # native parallel decode for file-backed sources (C++ thread pool,
        # native/fastdecode.cpp); PIL patches any failed slot
        from bacs_tpu.data.decode_pool import gather_host

        return gather_host(source, indices)

    def _host_stream(self, source, index_batches):
        """Decoded (imgs, lbls) per index batch — through the multi-process
        decode pool when configured and the source is pool-eligible, else
        serially in this thread.  Identical stream either way (the pool is
        order-preserving; tests/test_input_workers.py)."""
        from bacs_tpu.data.decode_pool import DecodePool, pool_eligible

        if self.input_workers >= 2 and pool_eligible(source):
            pool = self._pools.get(id(source))
            if pool is None:
                pool = DecodePool(source, self.input_workers)
                self._pools[id(source)] = pool
            return pool.stream(index_batches)
        return (self._gather(source, idx) for idx in index_batches)

    def close(self):
        """Terminate decode workers (idempotent)."""
        for pool in self._pools.values():
            pool.close()
        self._pools.clear()

    def _proc_slice(self, global_batch: int):
        """(lo, hi) of this process's contiguous slice of a global batch."""
        if self.process_count <= 1:
            return 0, global_batch
        assert global_batch % self.process_count == 0, (
            f"global batch {global_batch} not divisible by "
            f"{self.process_count} processes"
        )
        local = global_batch // self.process_count
        return self.process_index * local, (self.process_index + 1) * local

    def train_batches(
        self,
        epoch: int,
        n_devices: int = 1,
        task_id: Optional[int] = None,
        augment: bool = True,
        process_shard: bool = False,
    ) -> Iterator[Dict[str, jax.Array]]:
        """One epoch of device batches for the current task (prefetched)."""
        return _prefetch(
            self._train_batches_impl(
                epoch, n_devices, task_id, augment, process_shard
            )
        )

    def _train_batches_impl(
        self,
        epoch: int,
        n_devices: int = 1,
        task_id: Optional[int] = None,
        augment: bool = True,
        process_shard: bool = False,
    ) -> Iterator[Dict[str, jax.Array]]:
        t = self.task_id if task_id is None else task_id
        indices = self.train_indices(t)
        rng = np.random.RandomState((self.seed, t, epoch).__hash__() % (2**31))
        perm = rng.permutation(indices)
        global_batch = self.batch_size * n_devices
        n_steps = max(1, len(perm) // global_batch) if len(perm) >= global_batch else 1
        if len(perm) < global_batch:  # tile tiny debug sets to a full batch
            perm = np.resize(perm, global_batch)
        lo, hi = (
            self._proc_slice(global_batch) if process_shard
            else (0, global_batch)
        )
        table = jax.numpy.asarray(
            self.train_scenario.label_table(t, train=True)
            if self.continual
            else np.concatenate(
                [np.arange(256)[: self.num_classes],
                 np.full(256 - self.num_classes, 255)]
            ).astype(np.int32)
        )
        key = jax.random.PRNGKey(rng.randint(2**31))
        if process_shard and self.process_count > 1:
            # decorrelate per-process augmentation draws
            key = jax.random.fold_in(key, self.process_index)
        # NOTE: decode and transform/transfer run SERIALLY in this one
        # generator on purpose — splitting decode into its own second
        # prefetch thread was measured at 20.4 img/s vs 45.7 img/s for this
        # single-stage form (scripts/bench_input.py, 1-core host): three
        # Python threads on one core thrash where two pipeline cleanly.
        idx_batches = [
            perm[s * global_batch : (s + 1) * global_batch][lo:hi]
            for s in range(n_steps)
        ]
        for imgs, lbls in self._host_stream(self.train_source, idx_batches):
            key, sub = jax.random.split(key)
            if augment:
                yield transforms.train_transform(
                    sub, imgs, lbls, table, crop=self.crop_size
                )
            else:
                yield transforms.eval_transform(
                    imgs, lbls, table, crop=self.crop_size
                )

    def eval_batches(
        self,
        task_id: int,
        split: str = "val",
        n_devices: int = 1,
        process_shard: bool = False,
    ) -> Iterator[Dict[str, jax.Array]]:
        return _prefetch(
            self._eval_batches_impl(task_id, split, n_devices, process_shard)
        )

    def _eval_batches_impl(
        self,
        task_id: int,
        split: str = "val",
        n_devices: int = 1,
        process_shard: bool = False,
    ) -> Iterator[Dict[str, jax.Array]]:
        """Eval batches for ONE task's val subset with labels of tasks 0..t
        visible (reference: base_datamodule.py:407-431 get_val_test_all)."""
        source = self.val_source if split == "val" else (
            self.test_source or self.val_source
        )
        if self.domain_shift:
            # domain tasks validate on their own held-out 20% of the SAME
            # (merged) source (reference: cityscape_datamodule.py:270-295)
            source = self.train_source
            idx = self.val_scenario.val_indices(task_id)
            table = jax.numpy.asarray(
                self.val_scenario.label_table(self.task_id, train=False)
            )
        elif self.continual:
            scenario = self.val_scenario
            idx = scenario.task_indices(task_id)
            table = jax.numpy.asarray(
                scenario.label_table(self.task_id, train=False)
            )
        else:
            idx = np.arange(len(source))
            table = jax.numpy.asarray(
                np.concatenate(
                    [np.arange(256)[: self.num_classes],
                     np.full(256 - self.num_classes, 255)]
                ).astype(np.int32)
            )
        idx = self._subset(idx, np.random.RandomState(self.seed + 77 + task_id))
        global_batch = self.batch_size * n_devices
        lo, hi = (
            self._proc_slice(global_batch) if process_shard
            else (0, global_batch)
        )
        n_steps = math.ceil(len(idx) / global_batch)
        idx_batches, n_reals = [], []
        for s in range(n_steps):
            batch_idx = idx[s * global_batch : (s + 1) * global_batch]
            n_reals.append(len(batch_idx))
            if len(batch_idx) < global_batch:  # pad to static shape
                batch_idx = np.resize(batch_idx, global_batch)
            idx_batches.append(batch_idx[lo:hi])
        for n_real, (imgs, lbls) in zip(
            n_reals, self._host_stream(source, idx_batches)
        ):
            if n_real < hi:
                # padded duplicates must not count toward metrics; global
                # positions >= n_real fall in this process's [lo, hi) slice
                # at local offset n_real - lo
                if isinstance(lbls, jax.Array):  # device-cached source
                    lbls = lbls.at[max(0, n_real - lo):].set(255)
                else:
                    lbls = lbls.copy()
                    lbls[max(0, n_real - lo):] = 255
            out = transforms.eval_transform(imgs, lbls, table, crop=self.crop_size)
            # host-side real sample count: eval losses are sample-weighted
            # (reference: lightning batch-size-weighted epoch means)
            out = dict(out)
            out["n_real"] = n_real
            yield out

    def eval_task_range(self, up_to_task: int) -> List[int]:
        """Tasks evaluated after training task t: 0..t
        (reference: trainer.py:371-383)."""
        if not self.continual:
            return [0]
        return list(range(up_to_task + 1))


def _host_cores() -> int:
    import os

    try:
        return len(os.sched_getaffinity(0))
    except (AttributeError, OSError):
        import multiprocessing

        return multiprocessing.cpu_count()


def _resolve_workers(value) -> int:
    """Reference num_workers grammar (base_datamodule.py:45-54)."""
    if str(value).lower() == "auto":
        return _host_cores()
    return min(int(value or 0), _host_cores())


def create_datamodule(config) -> DataModule:
    """Build a DataModule from a reference-style config tree
    (reference `_target_` strings: dataloaders.VocDataModule etc.)."""
    dcfg = config["dataset"]
    tcfg = config["training"]
    target = str(dcfg.get("_target_", "synthetic")).lower().rsplit(".", 1)[-1]
    inner = dcfg.get("dataset", {})
    root = inner.get("root", "~/data")
    num_classes = int(inner.get("num_classes", 21))
    crop = int(inner.get("crop_size", 512))
    common = dict(
        num_classes=num_classes,
        crop_size=crop,
        batch_size=int(tcfg.get("batch_size", 8)),
        # reference num_workers semantics (base_datamodule.py:45-54):
        # "auto" = host-core count; `input_workers` wins if both are set.
        # Explicit counts are additionally clamped to the host's cores —
        # decode workers are CPU-bound, so extra processes only add
        # spawn/IPC cost (the reference's 2-GPU SLURM hosts had >=12).
        input_workers=_resolve_workers(
            tcfg.get("input_workers", tcfg.get("num_workers", 0))
        ),
        initial_increment=int(tcfg.get("initial_increment", 0) or 0),
        increment=int(tcfg.get("increment", 0) or 0),
        mode=str(tcfg.get("mode", "overlap")),
        shuffle_classes=bool(tcfg.get("shuffle_classes", False)),
        seed=int(tcfg.get("seed", 42)),
        debug=bool(tcfg.get("debug", False)),
        sweep=bool(tcfg.get("sweep", False)),
    )
    # gated download orchestration (reference: prepare_data hooks; this env
    # has no egress, so failures raise DownloadError with layout instructions)
    want_download = bool(inner.get("download", False))
    # decoded-sample cache: epochs >= 2 skip PNG/JPEG decode (the measured
    # host bottleneck, scripts/bench_input.py); lossless because sources
    # decode to a fixed canonical size.  true/"ram" → in-process arrays;
    # "disk" → persistent memmaps under <root>/cache
    cache_decoded = inner.get("cache_decoded", False)

    def _maybe_cache(src, root):
        if not cache_decoded:
            return src
        import os

        from bacs_tpu.data.datasets import DecodedCache, DeviceCache

        if str(cache_decoded).lower() == "device":
            # whole decoded set resident in HBM; batches gathered on device
            return DeviceCache(src)
        cache_dir = (
            os.path.expanduser(os.path.join(root, "cache"))
            if str(cache_decoded).lower() == "disk"
            else None
        )
        return DecodedCache(src, cache_dir)
    if "voc" in target:
        if want_download:
            from bacs_tpu.data.download import download_voc

            download_voc(root)
        train = _maybe_cache(make_voc_source(root, "train", crop), root)
        val = _maybe_cache(make_voc_source(root, "val", crop), root)
        import os

        common["cache_dir"] = os.path.expanduser(os.path.join(root, "cache"))
    elif "ade" in target:
        if want_download:
            from bacs_tpu.data.download import download_ade20k

            download_ade20k(root)
        train = _maybe_cache(make_ade_source(root, "train", crop), root)
        val = _maybe_cache(make_ade_source(root, "val", crop), root)
    elif "cityscape" in target:
        if want_download:
            from bacs_tpu.data.download import download_cityscapes

            download_cityscapes(
                root,
                str(inner.get("username", "")),
                str(inner.get("password", "")),
            )
        train = make_cityscapes_source(root, "train", crop)
        val = make_cityscapes_source(root, "val", crop)
        n_cities = inner.get("n_cities", None)
        if not n_cities:
            train = _maybe_cache(train, root)
            val = _maybe_cache(val, root)
        if n_cities:
            # domain-shift variant: cities become domains
            common["domain_ids"] = train.domain_ids
            common["n_domains_per_task"] = max(
                1, len(set(train.domain_ids)) // int(n_cities)
            )
    else:  # synthetic
        n_train = int(inner.get("n_train", 64))
        n_val = int(inner.get("n_val", 16))
        style = str(inner.get("style", "flat"))
        # controlled background-shift regime (see SyntheticSource.__init__):
        # `+dataset.dataset.cooccur=R` plants unlabeled old-class instances
        # in new-era images at rate R; `+dataset.dataset.bg_drift=true`
        # additionally shifts new-era background appearance.  Era structure
        # mirrors the training split (initial_increment/increment).
        era_kw = {}
        cooccur = float(inner.get("cooccur", -1.0))
        if cooccur >= 0 or bool(inner.get("bg_drift", False)):
            era_kw = dict(
                cooccur=max(cooccur, 0.0),
                bg_drift=bool(inner.get("bg_drift", False)),
                cooccur_initial=int(tcfg.get("initial_increment", 0) or 0),
                cooccur_increment=int(tcfg.get("increment", 0) or 1),
            )
        train = SyntheticSource(n_train, crop, num_classes, seed=1,
                                style=style, **era_kw)
        val = SyntheticSource(n_val, crop, num_classes, seed=2, style=style,
                              **era_kw)
        if str(cache_decoded).lower() == "device":
            from bacs_tpu.data.datasets import DeviceCache

            train, val = DeviceCache(train), DeviceCache(val)
        n_domains = inner.get("n_domains", None)
        if n_domains:
            domain_ids = [i % int(n_domains) for i in range(n_train)]
            # give the domains a REAL appearance shift so domain
            # forgetting is measurable (val is an 80/20 split of the
            # train source inside DomainScenario)
            train = DomainShiftedSource(train, domain_ids)
            common["domain_ids"] = domain_ids
    return DataModule(train, val, **common)
