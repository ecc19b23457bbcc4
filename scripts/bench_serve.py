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
    # bytes ARE latency — docs/RESULTS.md)
    wire_formats = (
        ("float16", False), ("uint8", False),
        ("uint8", True), ("none", True),
    )
    for conf_dtype, pack in wire_formats:
        pred = Predictor(
            net_cfg, n_classes, variables["params"],
            variables["batch_stats"], crop_size=crop, conf_dtype=conf_dtype,
            pack_masks=pack,
        )
        for bs in batches:
            imgs = rng.randint(0, 256, (bs, crop, crop, 3)).astype(np.uint8)
            pred.predict(imgs)  # compile + warm
            pred.predict(imgs)
            reps = 30
            t0 = time.perf_counter()
            for _ in range(reps):
                preds, conf = pred.predict(imgs)  # incl. host round-trip
            dt = (time.perf_counter() - t0) / reps
            print(json.dumps({
                "metric": f"deeplabv3_{backbone}_serve_batch{bs}_{crop}"
                          f"_conf_{conf_dtype}" + ("_packed" if pack else ""),
                "latency_ms": round(dt * 1e3, 2),
                "images_per_sec": round(bs / dt, 1),
            }))
            if bs > 1:
                # pipelined streaming: device compute of batch i+1 hides
                # under batch i's host transfer (Predictor.predict_many)
                stream = [imgs] * reps
                t0 = time.perf_counter()
                for _ in pred.predict_many(stream):
                    pass
                dt = (time.perf_counter() - t0) / reps
                print(json.dumps({
                    "metric": f"deeplabv3_{backbone}_serve_stream{bs}_{crop}"
                              f"_conf_{conf_dtype}"
                              + ("_packed" if pack else ""),
                    "latency_ms": round(dt * 1e3, 2),
                    "images_per_sec": round(bs / dt, 1),
                }))


if __name__ == "__main__":
    main(smoke="--smoke" in sys.argv)
