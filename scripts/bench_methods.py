"""On-chip train-step cost for EVERY continual-learning method.

Extends scripts/bench_bacs_step.py (the headline method) to the full
method zoo — CE fine-tuning, MiB, PLOP, iCaRL, ER, SDR, BACS — each at
the production shape (DeepLabV3-RN101 512² bf16 batch 16, task 1 of a
16+1×5 split, prev model frozen, buffers/prototypes live where the
method uses them).  Reference analogues: loss/mib.py, loss/plop_loss.py,
loss/icarl_loss.py, loss/experience_replay.py, loss/sdr.py,
loss/bacs_loss.py — the reference never publishes per-method step costs.

Usage: python scripts/bench_methods.py [--smoke] [--methods ce,mib,...]
Prints one BENCH-style JSON line per method.
"""

from __future__ import annotations

import argparse
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

# method key → (create_method target, kwargs, needs_detector)
METHODS = {
    "ce": ("loss.CrossEntropy", {}, False),
    "mib": ("loss.MiB", {}, False),
    "plop": ("loss.PlopLoss", {}, False),
    "icarl": ("loss.IcarlLoss", {}, False),
    "er": (
        "loss.ExperienceReplay",
        {"buffer_size": 50, "replay_minibatch_size": 8},
        False,
    ),
    "sdr": ("loss.SDR", {}, False),
    "bacs": (
        "loss.BACSLoss",
        {
            "use_bg_detector": True,
            "bg_weighted_ce": True,
            "buffer_size": 50,
            "replay_minibatch_size": 8,
            "alpha": 0.5,
            "beta": 0.5,
        },
        True,
    ),
}


def bench_one(name: str, smoke: bool) -> dict:
    from bacs_tpu.methods import create_method
    from bacs_tpu.methods.base import ModelContext
    from bacs_tpu.models import create_network
    from bacs_tpu.train import buffer as buffer_lib
    from bacs_tpu.train.optim import make_optimizer, poly_schedule
    from bacs_tpu.train.state import TaskInfo, TrainState
    from bacs_tpu.train.step import make_steps

    if smoke:
        crop, batch, backbone, reps, dtype = 64, 2, "resnet18", 2, jnp.float32
    else:
        crop, batch, backbone, reps, dtype = 512, 16, "resnet101", 20, jnp.bfloat16

    target, kwargs, detector = METHODS[name]
    n_classes, n_tasks = 21, 6
    net = create_network(
        "deeplab", backbone=backbone, num_classes=n_classes, n_tasks=n_tasks,
        use_bg_detector=detector, norm="iabn_sync", axis_name=None,
        crop_size=crop, dtype=dtype,
    )
    task = TaskInfo(
        task_id=1, initial_classes=16, increment=1, num_classes=n_classes,
        n_tasks=n_tasks, max_epochs=30,
    )
    ctx = ModelContext(model=net, task=task, axis_name=None)
    method = create_method(target, **kwargs)
    tx = make_optimizer(
        {"_target_": "torch.optim.SGD", "lr": 0.01, "momentum": 0.9,
         "nesterov": True, "weight_decay": 1e-4},
        poly_schedule(0.01, 1000),
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, crop, crop, 3).astype(np.float32))
    # labels only ever contain classes seen so far (the datamodule's label
    # transform maps future-task classes to bg/ignore before the loss);
    # out-of-range ids would NaN the plain-CE one-hot path
    n_cur = task.initial_classes + task.increment * task.task_id
    y = jnp.asarray(
        rng.randint(0, n_cur, (batch, crop, crop)).astype(np.int32)
    )
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x[:1], train=True,
    )
    out = net.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        x[:1], train=False,
    )
    pen_dim = out.penultimate.shape[-1]
    buf = None
    if getattr(method, "buffer_size", 0):
        buf = method.init_buffer(task, (crop, crop), out.sem_logits.shape[1:3])
        buf = buffer_lib.add_batch(
            buf, jax.random.PRNGKey(2),
            jnp.asarray(rng.rand(8, crop, crop, 3).astype(np.float32)),
            jnp.zeros((8,) + tuple(out.sem_logits.shape[1:3]) + (n_classes,)),
            jnp.asarray(rng.randint(0, 16, (8, crop, crop)).astype(np.int32)),
            jnp.zeros((8,)), task_id=0, n_classes=16,
        )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        rng=jax.random.PRNGKey(3),
        prototypes=jnp.ones((n_tasks, pen_dim)) * 0.1,
        proto_counts=jnp.ones((n_tasks,)) * 100.0,
        class_prototypes=jnp.ones((n_classes, pen_dim)) * 0.1,
        class_proto_counts=jnp.ones((n_classes,)) * 100.0,
        prev_params=jax.tree.map(jnp.copy, variables["params"]),
        prev_batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
        buffer=buf,
    )
    batch_dict = {"image": x, "label": y}
    # the method's own task-start pass (PLOP computes its median-entropy
    # thresholds here; a no-op or prev-model refresh for the others)
    state = method.begin_task(state, ctx, iter([batch_dict]))

    train_step, _, _ = make_steps(ctx, method, tx, n_classes, mesh=None)
    t0 = time.perf_counter()
    state, metrics = train_step(state, batch_dict)
    loss0 = float(metrics["loss"])  # sync through the tunnel
    print(f"# {name}: first step (compile) {time.perf_counter() - t0:.1f}s "
          f"loss {loss0:.3f}", flush=True)
    assert np.isfinite(loss0), (name, loss0)
    state, metrics = train_step(state, batch_dict)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(reps):
        state, metrics = train_step(state, batch_dict)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / reps
    return {
        "metric": f"{name}_step_{backbone}_{crop}_b{batch}",
        "step_ms": round(dt * 1e3, 1),
        "images_per_sec": round(batch / dt, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--methods", default=",".join(METHODS))
    args = ap.parse_args()
    for name in args.methods.split(","):
        print(json.dumps(bench_one(name.strip(), args.smoke)), flush=True)


if __name__ == "__main__":
    main()
