"""Component-level timing of the DeepLabV3 train step on the attached TPU.

Quantifies where the 512² step time goes to guide kernel work:
forward / forward+backward / full step / step without logit upsample /
batch-size scaling.  All timings force a device→host sync (axon tunnel
ignores block_until_ready).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bacs_tpu.methods import create_method
from bacs_tpu.methods.base import ModelContext
from bacs_tpu.models import create_network
from bacs_tpu.ops.losses import cross_entropy
from bacs_tpu.train.optim import make_optimizer, poly_schedule
from bacs_tpu.train.state import TaskInfo, TrainState
from bacs_tpu.train.step import make_steps


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def timeit(fn, *args, repeats=10):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / repeats


def main(crop=512, batch=16):
    n_classes = 21
    net = create_network(
        "deeplab", backbone="resnet101", num_classes=n_classes,
        norm="iabn_sync", axis_name=None, crop_size=crop, dtype=jnp.bfloat16,
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(batch, crop, crop, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, n_classes, (batch, crop, crop)).astype(np.int32))
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x[:1], train=True,
    )
    params, stats = variables["params"], variables["batch_stats"]

    @jax.jit
    def fwd(params, stats, x):
        out, mut = net.apply(
            {"params": params, "batch_stats": stats}, x, train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return out.logits

    @jax.jit
    def fwd_loss_full(params, stats, x, y):
        out, mut = net.apply(
            {"params": params, "batch_stats": stats}, x, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return cross_entropy(out.logits, y)

    @jax.jit
    def fwd_loss_lowres(params, stats, x, y):
        out, mut = net.apply(
            {"params": params, "batch_stats": stats}, x, train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)},
        )
        # CE at sem-logit resolution (labels nearest-downsampled)
        from bacs_tpu.ops.interpolate import resize_nearest

        y_small = resize_nearest(y, out.sem_logits.shape[1:3])
        return cross_entropy(out.sem_logits.astype(jnp.float32), y_small)

    grad_full = jax.jit(jax.grad(fwd_loss_full))
    grad_lowres = jax.jit(jax.grad(fwd_loss_lowres))

    print(f"batch={batch} crop={crop}")
    t = timeit(fwd, params, stats, x)
    print(f"forward only:          {t * 1e3:8.1f} ms  ({batch / t:7.1f} img/s)")
    t = timeit(grad_full, params, stats, x, y)
    print(f"grad (full-res CE):    {t * 1e3:8.1f} ms  ({batch / t:7.1f} img/s)")
    t = timeit(grad_lowres, params, stats, x, y)
    print(f"grad (sem-res CE):     {t * 1e3:8.1f} ms  ({batch / t:7.1f} img/s)")

    task = TaskInfo(0, n_classes, 0, n_classes, 1, 1)
    ctx = ModelContext(net, task, None)
    method = create_method("loss.CrossEntropy")
    tx = make_optimizer(
        {"_target_": "torch.optim.SGD", "lr": 0.01, "momentum": 0.9},
        poly_schedule(0.01, 1000),
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params, batch_stats=stats,
        opt_state=tx.init(params), rng=jax.random.PRNGKey(2),
        prototypes=jnp.zeros((1, 2048)), proto_counts=jnp.zeros((1,)),
    )
    train_step, _, _ = make_steps(ctx, method, tx, n_classes, mesh=None)
    b = {"image": x, "label": y}

    def full(state):
        s2, m = train_step(state, b)
        return m["loss"]

    state, m = train_step(state, b)
    float(m["loss"])
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        state, m = train_step(state, b)
    float(m["loss"])
    t = (time.perf_counter() - t0) / n
    print(f"full train step:       {t * 1e3:8.1f} ms  ({batch / t:7.1f} img/s)")


if __name__ == "__main__":
    import sys

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    main(batch=batch)
