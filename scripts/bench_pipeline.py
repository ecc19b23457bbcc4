"""End-to-end input-pipeline-fed train-step throughput at 512².

VERDICT r4 next #6: demonstrate (not project) a chip-rate host pipeline.
Feeds the REAL DeepLabV3-RN101 512² bf16 train step from the REAL
DataModule path (train_batches → on-device augment → step), with the
dataset HBM-resident via DeviceCache — the production configuration for
sets that fit HBM (reference host path:
dataloaders/base_datamodule.py:341-377, torch DataLoader workers; the TPU
answer is to remove the host from the steady-state loop entirely).

    python scripts/bench_pipeline.py [--crop 512 --batch 16 --steps 40]
    python scripts/bench_pipeline.py --cache none   # host-decode contrast

Prints one JSON line with sustained images/sec (pipeline INCLUDING data)
and the step-only rate measured in the same process for an apples
denominator.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--crop", type=int, default=512)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--n-train", type=int, default=768)
    ap.add_argument("--backbone", default="resnet101")
    ap.add_argument("--cache", default="device",
                    choices=("device", "ram", "none"),
                    help="none = per-batch host decode + transfer")
    args = ap.parse_args()

    from bacs_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from bacs_tpu.data.datamodule import create_datamodule
    from bacs_tpu.methods import create_method
    from bacs_tpu.methods.base import ModelContext
    from bacs_tpu.models import create_network
    from bacs_tpu.train.optim import make_optimizer, poly_schedule
    from bacs_tpu.train.state import TaskInfo, TrainState
    from bacs_tpu.train.step import make_steps

    n_classes = 21
    cfg = {
        "dataset": {
            "_target_": "dataloaders.SyntheticDataModule",
            "dataset": {
                "num_classes": n_classes, "crop_size": args.crop,
                "n_train": args.n_train, "n_val": 32, "style": "rich",
                **({"cache_decoded": args.cache}
                   if args.cache != "none" else {}),
            },
        },
        "training": {
            "batch_size": args.batch, "initial_increment": 0,
            "increment": 0, "mode": "overlap", "seed": 0, "debug": False,
        },
    }
    dm = create_datamodule(cfg)

    net = create_network(
        "deeplab", backbone=args.backbone, num_classes=n_classes,
        norm="iabn_sync", axis_name=None, crop_size=args.crop,
        dtype=jnp.bfloat16,
    )
    task = TaskInfo(task_id=0, initial_classes=n_classes, increment=0,
                    num_classes=n_classes, n_tasks=1, max_epochs=1)
    ctx = ModelContext(model=net, task=task, axis_name=None)
    method = create_method("loss.CrossEntropy")
    tx = make_optimizer(
        {"_target_": "torch.optim.SGD", "lr": 0.01, "momentum": 0.9,
         "nesterov": True, "weight_decay": 1e-4},
        poly_schedule(0.01, 1000),
    )
    dummy = jnp.zeros((1, args.crop, args.crop, 3), jnp.float32)
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        dummy, train=True,
    )
    pen = 2048 if args.backbone in ("resnet50", "resnet101") else 512
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        rng=jax.random.PRNGKey(2),
        prototypes=jnp.zeros((1, pen)),
        proto_counts=jnp.zeros((1,)),
    )
    train_step, _, _ = make_steps(ctx, method, tx, n_classes, mesh=None)

    def batches():
        epoch = 0
        while True:
            for b in dm.train_batches(epoch):
                yield b
            epoch += 1

    it = batches()
    # warmup: compile + populate the device cache (first gather decodes)
    for _ in range(3):
        state, metrics = train_step(state, next(it))
    loss = float(metrics["loss"])  # tunnel-safe sync

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = train_step(state, next(it))
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    pipe_rate = args.steps * args.batch / dt

    # step-only denominator in the SAME process (same thermal/tunnel state)
    fixed = next(it)
    state, metrics = train_step(state, fixed)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = train_step(state, fixed)
    float(metrics["loss"])
    step_rate = args.steps * args.batch / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": f"pipeline_fed_train_images_per_sec_{args.crop}"
                  f"_cache_{args.cache}",
        "value": round(pipe_rate, 2),
        "unit": "images/sec/chip",
        "step_only": round(step_rate, 2),
        "pipeline_efficiency": round(pipe_rate / step_rate, 4),
        "loss": round(loss, 4),
    }))


if __name__ == "__main__":
    main()
