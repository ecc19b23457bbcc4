"""Host input-pipeline benchmark: disk → decode → transform → device.

Answers the round-2 open question (VERDICT r2 missing #2): can the 1-core
host feed the chip's 227 img/s train step?  Reference analogue: the
worker/prefetch torch DataLoader (reference:
dataloaders/base_datamodule.py:341-377).

Measures, over a generated real-layout VOC tree (scripts/gen_voc_layout.py):

  1. native batch decode  — C++ thread-pool JPEG+PNG decode+resize
                            (native/fastdecode.cpp) to the canonical size
  2. PIL decode           — the pure-python fallback path
  3. full train pipeline  — FolderSource → native decode → fused device
                            train_transform → prefetch thread (exactly
                            DataModule.train_batches)

Each prints one BENCH-style JSON line.  Run on the TPU host:

    python scripts/bench_input.py [--root /tmp/voc_synth_bench] [--crop 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bacs_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

DEVICE_IMGS_PER_SEC = 227.0  # bench.py round-2 single-chip train step


def _log(msg):
    print(f"# {msg}", flush=True)


def _ensure_layout(root: str, n: int, size: int) -> None:
    voc = os.path.join(os.path.expanduser(root), "VOCdevkit", "VOC2012")
    # the list file is written LAST — its presence means a complete layout
    if os.path.exists(
        os.path.join(voc, "ImageSets", "Segmentation", "train_aug.txt")
    ):
        return
    from scripts.gen_voc_layout import generate

    print(f"generating {n}-image VOC layout at {root} ...")
    generate(root, n_train=n, n_val=max(8, n // 8), size=size)


def bench_decode(source, batch_size: int, n_batches: int, native: bool):
    import numpy as np

    idx = np.arange(len(source))
    # warmup (thread pool spin-up / page cache)
    if native:
        assert source.load_batch(list(idx[:batch_size])) is not None, (
            "native decoder unavailable — build native/ first"
        )
    t0 = time.perf_counter()
    n_imgs = 0
    for b in range(n_batches):
        sel = [int(i) for i in np.roll(idx, b)[:batch_size]]
        if native:
            out = source.load_batch(sel)
            assert out is not None
        else:
            for i in sel:
                source.load(i)
        n_imgs += batch_size
    dt = time.perf_counter() - t0
    return n_imgs / dt


def bench_pipelines(dms, n_devices: int, epochs: int):
    """Measure several DataModules' pipelines ROUND-ROBIN, epoch by epoch.

    The pipeline includes the host→device transfer, and on tunneled dev
    hosts the link bandwidth drifts ~2× at minute timescales — sequential
    blocks are NOT comparable (the same lesson as bench_serve.py).  One
    warmup epoch per pipeline compiles the transform jits (and fills any
    decoded cache); sync via scalar pull (block_until_ready is unreliable
    through the axon tunnel).
    """
    for name, dm in dms.items():
        for batch in dm.train_batches(epoch=0, n_devices=n_devices):
            float(batch["image"][0, 0, 0, 0])
        _log(f"{name}: warmup epoch done")
    totals = {name: [0, 0.0] for name in dms}
    for ep in range(1, epochs + 1):
        for name, dm in dms.items():
            t0 = time.perf_counter()
            n = 0
            for batch in dm.train_batches(epoch=ep, n_devices=n_devices):
                float(batch["image"][0, 0, 0, 0])
                n += batch["image"].shape[0]
            totals[name][0] += n
            totals[name][1] += time.perf_counter() - t0
    return {name: n / dt for name, (n, dt) in totals.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/voc_synth_bench")
    ap.add_argument("--crop", type=int, default=512)
    ap.add_argument("--n-images", type=int, default=128)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--n-batches", type=int, default=12)
    args = ap.parse_args()

    _ensure_layout(args.root, args.n_images, size=int(args.crop * 0.75))

    from bacs_tpu.data.datamodule import DataModule
    from bacs_tpu.data.datasets import make_voc_source

    src = make_voc_source(args.root, "train", args.crop)

    native_ips = bench_decode(src, args.batch_size, args.n_batches, native=True)
    _log(f"native decode {native_ips:.1f} img/s")
    pil_ips = bench_decode(
        src, args.batch_size, max(2, args.n_batches // 4), native=False
    )
    _log(f"pil decode {pil_ips:.1f} img/s")

    # decoded-sample cache (bacs_tpu/data/datasets.py DecodedCache;
    # `dataset.dataset.cache_decoded=true`, RAM mode — the disk/memmap mode
    # measured SLOWER than re-decoding on this Firecracker host: the guest
    # page cache does not retain file pages and cold reads run ~10 MB/s,
    # i.e. 8× the PNG bytes at the same disk speed).  Warmup fills it,
    # later epochs serve raw bytes.  Host-side read throughput first
    # (no device/tunnel):
    from bacs_tpu.data.datasets import DecodedCache

    cached_src = DecodedCache(src)
    cached_src.load_batch(list(range(len(src))))  # fill
    cached_read_ips = bench_decode(
        cached_src, args.batch_size, args.n_batches, native=True
    )
    _log(f"cached RAM read {cached_read_ips:.1f} img/s")

    val = make_voc_source(args.root, "val", args.crop)
    dm = DataModule(
        src, val, num_classes=21, crop_size=args.crop,
        batch_size=args.batch_size,
    )
    dm_cached = DataModule(
        cached_src, DecodedCache(val),
        num_classes=21, crop_size=args.crop, batch_size=args.batch_size,
    )
    pipes = bench_pipelines(
        {"uncached": dm, "cached": dm_cached}, n_devices=1, epochs=2
    )
    pipe_ips, cached_ips = pipes["uncached"], pipes["cached"]

    rows = [
        ("host_native_decode_images_per_sec", native_ips),
        ("host_pil_decode_images_per_sec", pil_ips),
        ("host_cached_ram_read_images_per_sec", cached_read_ips),
        ("host_input_pipeline_images_per_sec", pipe_ips),
        ("host_input_pipeline_cached_images_per_sec", cached_ips),
    ]
    for name, v in rows:
        print(json.dumps({
            "metric": name,
            "value": round(v, 2),
            "unit": "images/sec",
            "vs_baseline": round(v / DEVICE_IMGS_PER_SEC, 3),
        }))
    if pipe_ips < DEVICE_IMGS_PER_SEC:
        print(f"# NOTE: pipeline {pipe_ips:.0f} img/s < device "
              f"{DEVICE_IMGS_PER_SEC:.0f} img/s — input-bound on this host")
    if cached_ips < pipe_ips:
        print("# NOTE: cached pipeline slower HERE is a tunneled-1-core "
              "artifact (prefetch upload stops overlapping the sync once "
              "the worker isn't in GIL-releasing decode; without the "
              "prefetch thread both tie at the tunnel bound) — the "
              "production-relevant number is the host-side decode vs "
              "cached-read ratio above.  See docs/RESULTS.md.")


if __name__ == "__main__":
    main()
