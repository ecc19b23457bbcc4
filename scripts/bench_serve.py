"""Serving benchmark: Predictor latency/throughput, DeepLabV3-RN101 512².

Measures the inference surface (bacs_tpu/serve.py Predictor — argmax masks
+ confidences from uint8 inputs) on the real device at batch 1 (latency)
and batch 16 (throughput).  Prints one JSON line per config.

Usage: python scripts/bench_serve.py [--smoke]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bacs_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main(smoke: bool = False):
    from bacs_tpu.serve import Predictor

    if smoke:
        crop, backbone, batches = 64, "resnet18", (1, 2)
    else:
        crop, backbone, batches = 512, "resnet101", (1, 16)

    net_cfg = {"_target_": "networks.DeepLabV3", "backbone": backbone,
               "norm": "iabn_sync"}
    n_classes = 21

    # fresh-init weights: serving perf is weight-independent
    from bacs_tpu.models import create_network

    model = create_network(
        "deeplab", backbone=backbone, num_classes=n_classes, norm="iabn_sync",
        axis_name=None, crop_size=crop, dtype=jnp.bfloat16,
    )
    x0 = jnp.zeros((1, crop, crop, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0, train=False,
    )
    rng = np.random.RandomState(0)
    # wire formats, fattest to leanest: f16 conf (lossless default),
    # 1/255-quantized conf, quantized conf + 5-bit packed masks, and
    # packed masks alone (serving is device→host-link-bound, so payload
    # bytes ARE latency — docs/RESULTS.md).  The tunneled link's
    # bandwidth drifts at ~minute timescales, so formats are measured
    # ROUND-ROBIN within one rep loop — every format sees the same
    # drift — instead of one sequential block per format.
    wire_formats = (
        ("float16", False), ("uint8", False),
        ("uint8", True), ("none", True),
    )
    preds_by_fmt = {
        fmt: Predictor(
            net_cfg, n_classes, variables["params"],
            variables["batch_stats"], crop_size=crop, conf_dtype=fmt[0],
            pack_masks=fmt[1],
        )
        for fmt in wire_formats
    }
    reps = 20
    for bs in batches:
        imgs = rng.randint(0, 256, (bs, crop, crop, 3)).astype(np.uint8)
        stream = [imgs] * 4
        for pred in preds_by_fmt.values():  # compile + warm everything
            pred.predict(imgs)
            pred.predict(imgs)
            for _ in pred.predict_many(stream):
                pass
        totals = {fmt: 0.0 for fmt in wire_formats}
        stream_totals = {fmt: 0.0 for fmt in wire_formats}
        for _ in range(reps):
            for fmt, pred in preds_by_fmt.items():
                t0 = time.perf_counter()
                pred.predict(imgs)  # incl. host round-trip
                totals[fmt] += time.perf_counter() - t0
                if bs > 1:
                    # pipelined streaming: batch i+1's device compute
                    # hides under batch i's host transfer (predict_many)
                    t0 = time.perf_counter()
                    for _ in pred.predict_many(stream):
                        pass
                    stream_totals[fmt] += (time.perf_counter() - t0) / len(
                        stream
                    )
        for fmt in wire_formats:
            conf_dtype, pack = fmt
            suffix = f"_conf_{conf_dtype}" + ("_packed" if pack else "")
            rows = [("batch", totals[fmt])]
            if bs > 1:
                rows.append(("stream", stream_totals[fmt]))
            for kind, total in rows:
                dt = total / reps
                print(json.dumps({
                    "metric": f"deeplabv3_{backbone}_serve_{kind}{bs}"
                              f"_{crop}{suffix}",
                    "latency_ms": round(dt * 1e3, 2),
                    "images_per_sec": round(bs / dt, 1),
                }))


if __name__ == "__main__":
    main(smoke="--smoke" in sys.argv)
