"""Benchmark: DeepLabV3/ResNet-101 train images/sec/chip at 512² (bf16).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

`--network transeg` benchmarks the transformer head instead (TranSeg,
reference: networks/transeg.py:85-175 — RN101 backbone + 2-layer decoder
over 32×32=1024 tokens + class-token mask head).

Baseline (BASELINE.md): the reference trains BACS on 2× GPU with PL fp16 at
batch 12, 512².  The driver-set north star is ≥2× A100 images/sec/chip; we
report measured TPU throughput with vs_baseline = value / A100_REF where
A100_REF is a published-order-of-magnitude A100 fp16 DeepLabV3+R101 train
throughput (≈45 img/s/GPU at 512²).

Usage: python bench.py [--smoke]   (--smoke: tiny shapes, CPU-safe)
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# The reference publishes NO throughput numbers (BASELINE.md: "published": {}),
# so the denominator is a literature estimate for fp16 DeepLabV3+RN101 512²
# train on one A100: MLPerf-era semantic-segmentation training reports and
# vendor model-zoo tables put it at ~40-55 img/s/GPU (e.g. NVIDIA DeepLearning
# Examples DeepLabV3 numbers scaled from V100, and MMSeg benchmark tables).
# We use the midpoint 45; the true bracket [40, 55] bounds vs_baseline within
# ±12% of the reported ratio.
A100_REF_IMG_PER_SEC = 45.0
A100_REF_BRACKET = (40.0, 55.0)


def bench(smoke: bool = False, network: str = "deeplab",
          remat: bool = False, crop: int | None = None,
          batch: int | None = None):
    from bacs_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from bacs_tpu.methods import create_method
    from bacs_tpu.methods.base import ModelContext
    from bacs_tpu.models import create_network
    from bacs_tpu.train.optim import make_optimizer, poly_schedule
    from bacs_tpu.train.state import TaskInfo, TrainState
    from bacs_tpu.train.step import make_steps

    if smoke:
        crop, batch, backbone, steps, dtype = 64, 2, "resnet18", 3, jnp.float32
    else:
        backbone, steps, dtype = "resnet101", 20, jnp.bfloat16
        crop = crop or 512
        batch = batch or 16

    n_classes = 21
    if network == "transeg":
        # the production transformer config
        # (conf/bacs/network/deep_lab_transformer.yaml)
        net = create_network(
            "transeg",
            backbone=backbone,
            num_classes=n_classes,
            norm="iabn_sync",
            axis_name=None,
            crop_size=crop,
            dtype=dtype,
            transformer=dict(hidden_dim=256, nhead=2, num_decoder_layers=2,
                             dim_feedforward=2048),
            remat=remat,
        )
    else:
        net = create_network(
            "deeplab",
            backbone=backbone,
            num_classes=n_classes,
            norm="iabn_sync",
            axis_name=None,
            crop_size=crop,
            dtype=dtype,
            remat=remat,
        )
    task = TaskInfo(
        task_id=0, initial_classes=n_classes, increment=0,
        num_classes=n_classes, n_tasks=1, max_epochs=1,
    )
    ctx = ModelContext(model=net, task=task, axis_name=None)
    method = create_method("loss.CrossEntropy")
    tx = make_optimizer(
        {"_target_": "torch.optim.SGD", "lr": 0.01, "momentum": 0.9,
         "nesterov": True, "weight_decay": 1e-4},
        poly_schedule(0.01, 1000),
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, crop, crop, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, n_classes, (batch, crop, crop)).astype(np.int32))
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x[:1], train=True,
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        rng=jax.random.PRNGKey(2),
        prototypes=jnp.zeros((1, 2048 if backbone == "resnet101" else 512)),
        proto_counts=jnp.zeros((1,)),
    )
    train_step, _, _ = make_steps(ctx, method, tx, n_classes, mesh=None)
    batch_dict = {"image": x, "label": y}

    # warmup / compile.  NB: block_until_ready does not reliably wait through
    # the axon TPU tunnel — force a device→host transfer to sync.
    state, metrics = train_step(state, batch_dict)
    float(metrics["loss"])
    state, metrics = train_step(state, batch_dict)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = train_step(state, batch_dict)
    float(metrics["loss"])  # host transfer = real sync
    dt = time.perf_counter() - t0
    img_per_sec = steps * batch / dt
    name = (f"transeg_rn101_train_images_per_sec_per_chip_{crop}"
            if network == "transeg"
            else f"deeplabv3_rn101_train_images_per_sec_per_chip_{crop}")
    if remat:
        name += "_remat"
    if batch != 16 and not smoke:
        name += f"_b{batch}"
    print(
        json.dumps(
            {
                "metric": name,
                "value": round(img_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_per_sec / A100_REF_IMG_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU-safe shapes, 3 steps")
    ap.add_argument("--network", choices=("deeplab", "transeg"),
                    default="deeplab")
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint over ResNet blocks "
                         "(training.network.remat)")
    ap.add_argument("--crop", type=int, default=None,
                    help="crop size (default 512); e.g. 768 needs --remat "
                         "to fit batch 16 in v5e HBM")
    ap.add_argument("--batch", type=int, default=None,
                    help="batch size (default 16)")
    args = ap.parse_args()
    bench(smoke=args.smoke, network=args.network, remat=args.remat,
          crop=args.crop, batch=args.batch)
