"""Full-BACS train-step benchmark at 512² (the headline CL method).

Measures the real continual-learning step — weighted CE gated by
seen-probs, seen-detector focal loss, teacher distillation against the
frozen previous model, and both dark replay terms sampled from the HBM
buffer — on DeepLabV3-RN101 512² bf16 batch 16, task 1 of a 16+...
split.  Compares against the plain CE step (bench.py's 70 ms).

Usage: python scripts/bench_bacs_step.py [--smoke]
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


def main(smoke: bool = False, bg_weighted: bool = True, replay: bool = True,
         merged: bool = False, remat: bool = False):
    from bacs_tpu.methods import create_method
    from bacs_tpu.methods.base import ModelContext
    from bacs_tpu.models import create_network
    from bacs_tpu.train import buffer as buffer_lib
    from bacs_tpu.train.optim import make_optimizer, poly_schedule
    from bacs_tpu.train.state import TaskInfo, TrainState
    from bacs_tpu.train.step import make_steps

    if smoke:
        crop, batch, backbone, reps, dtype = 64, 2, "resnet18", 3, jnp.float32
    else:
        crop, batch, backbone, reps, dtype = 512, 16, "resnet101", 20, jnp.bfloat16

    n_classes, n_tasks = 21, 6
    net = create_network(
        "deeplab", backbone=backbone, num_classes=n_classes, n_tasks=n_tasks,
        use_bg_detector=True, norm="iabn_sync", axis_name=None,
        crop_size=crop, dtype=dtype, remat=remat,
    )
    task = TaskInfo(
        task_id=1, initial_classes=16, increment=1, num_classes=n_classes,
        n_tasks=n_tasks, max_epochs=30,
    )
    ctx = ModelContext(model=net, task=task, axis_name=None)
    a = 0.5 if replay else 0.0
    method = create_method(
        "loss.BACSLoss", use_bg_detector=True, bg_weighted_ce=bg_weighted,
        buffer_size=50, replay_minibatch_size=8, alpha=a, beta=a,
        merged_replay=merged,  # --merged: single-forward replay experiment
    )
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
    out = net.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        x[:1], train=False,
    )
    buf = method.init_buffer(task, (crop, crop), out.sem_logits.shape[1:3])
    buf = buffer_lib.add_batch(
        buf, jax.random.PRNGKey(2),
        jnp.asarray(rng.rand(8, crop, crop, 3).astype(np.float32)),
        jnp.zeros((8,) + tuple(out.sem_logits.shape[1:3]) + (n_classes,)),
        jnp.asarray(rng.randint(0, 16, (8, crop, crop)).astype(np.int32)),
        jnp.zeros((8,)), task_id=0, n_classes=16,
    )
    pen_dim = out.penultimate.shape[-1]
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        rng=jax.random.PRNGKey(3),
        prototypes=jnp.ones((n_tasks, pen_dim)) * 0.1,
        proto_counts=jnp.ones((n_tasks,)) * 100.0,
        prev_params=jax.tree.map(jnp.copy, variables["params"]),
        prev_batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
        buffer=buf,
    )
    train_step, _, _ = make_steps(ctx, method, tx, n_classes, mesh=None)
    batch_dict = {"image": x, "label": y}

    import time as _t
    print(f"# compiling...", flush=True)
    _c0 = _t.perf_counter()
    state, metrics = train_step(state, batch_dict)
    float(metrics["loss"])  # sync through the tunnel
    print(f"# first step (compile) {_t.perf_counter()-_c0:.1f}s", flush=True)
    state, metrics = train_step(state, batch_dict)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(reps):
        state, metrics = train_step(state, batch_dict)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({
        "metric": f"bacs_step_{backbone}_{crop}_b{batch}"
                  f"_w{int(bg_weighted)}_r{int(replay)}"
                  + ("_merged" if merged else "")
                  + ("_remat" if remat else ""),
        "step_ms": round(dt * 1e3, 1),
        "images_per_sec": round(batch / dt, 1),
    }))


if __name__ == "__main__":
    main(
        smoke="--smoke" in sys.argv,
        bg_weighted="--no-weighted" not in sys.argv,
        replay="--no-replay" not in sys.argv,
        merged="--merged" in sys.argv,
        remat="--remat" in sys.argv,
    )
