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
         merged: bool = False, remat=False, buffer_size: int = 50,
         replay_batch: int = 8, image_uint8: bool = False,
         batch_override: int = 0, accum: int = 1, resident_mb: int = 0):
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
    if batch_override:
        batch = batch_override
    # --resident-mb: park a uint8 array in HBM emulating the DeviceCache
    # dataset residency of a protocol run (15-1-paper: 1024 imgs ≈ 1.0 GB)
    resident = (jnp.zeros((resident_mb, 1024, 1024), jnp.uint8)
                if resident_mb else None)
    if resident is not None:
        resident.block_until_ready()

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
        buffer_size=buffer_size, replay_minibatch_size=replay_batch,
        alpha=a, beta=a,
        merged_replay=merged,  # --merged: single-forward replay experiment
        # --image-uint8: lossless raw-pixel image storage (half of bf16's
        # image bytes; the production capacity option, docs/PARITY.md)
        buffer_image_dtype="uint8" if image_uint8 else None,
    )
    tx = make_optimizer(
        {"_target_": "torch.optim.SGD", "lr": 0.01, "momentum": 0.9,
         "nesterov": True, "weight_decay": 1e-4},
        poly_schedule(0.01, 1000),
        accumulate_steps=accum,
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
    # fill the buffer PAST capacity so replay samples real slots and the
    # eviction scan (score softmax over every slot) runs at full width —
    # the production-scale question (VERDICT r3 weak #5: buffer 300)
    n_slots = buf.images.shape[0]
    fill_chunk = 8

    # jit + donate, exactly like the train path (end_task populate donates
    # state): the slot scatter is then in-place — an eager add_batch would
    # copy the whole multi-hundred-MB buffer per call and report that copy
    # as "eviction cost"
    def _add(buf, sub, imgs, lg, lb):
        return buffer_lib.add_batch(
            buf, sub, imgs, lg, lb, jnp.zeros((fill_chunk,)),
            task_id=0, n_classes=16,
        )

    _add_donated = jax.jit(_add, donate_argnums=(0,))
    key = jax.random.PRNGKey(2)
    add_times = []
    for it in range((n_slots // fill_chunk) + 2):
        key, sub = jax.random.split(key)
        imgs = jnp.asarray(
            rng.rand(fill_chunk, crop, crop, 3).astype(np.float32)
        )
        lg = jnp.zeros(
            (fill_chunk,) + tuple(out.sem_logits.shape[1:3]) + (n_classes,)
        )
        lb = jnp.asarray(
            rng.randint(0, 16, (fill_chunk, crop, crop)).astype(np.int32)
        )
        float(jnp.sum(imgs[0, 0]))  # sync uploads outside the timed region
        t0 = time.perf_counter()
        buf = _add_donated(buf, sub, imgs, lg, lb)
        float(buf.num_seen)  # sync through the tunnel
        add_times.append(time.perf_counter() - t0)
    # steady-state eviction-scan cost = the last adds (buffer at capacity)
    evict_ms = float(np.median(add_times[-3:]) * 1e3)
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
    try:
        ms = jax.local_devices()[0].memory_stats() or {}
        hbm_gb = round(ms.get("peak_bytes_in_use", 0) / 2**30, 2)
        hbm_limit = round(ms.get("bytes_limit", 0) / 2**30, 2)
    except Exception:
        hbm_gb = hbm_limit = 0.0
    print(json.dumps({
        "metric": f"bacs_step_{backbone}_{crop}_b{batch}"
                  f"_w{int(bg_weighted)}_r{int(replay)}"
                  f"_buf{n_slots}_rb{replay_batch}"
                  + ("_u8" if image_uint8 else "")
                  + ("_merged" if merged else "")
                  + ("" if not remat else "_remat" if remat is True
                     else "_remat" + "-".join(map(str, remat)))
                  + (f"_acc{accum}" if accum > 1 else "")
                  + (f"_res{resident_mb}" if resident_mb else ""),
        "step_ms": round(dt * 1e3, 1),
        "images_per_sec": round(batch / dt, 1),
        "evict_add_ms": round(evict_ms, 1),
        "hbm_peak_gb": hbm_gb,
        "hbm_limit_gb": hbm_limit,
    }))


def _flag(name: str, default: int) -> int:
    if name in sys.argv:
        return int(sys.argv[sys.argv.index(name) + 1])
    return default


if __name__ == "__main__":
    main(
        smoke="--smoke" in sys.argv,
        bg_weighted="--no-weighted" not in sys.argv,
        replay="--no-replay" not in sys.argv,
        merged="--merged" in sys.argv,
        # --remat = full per-block remat; --remat-stages 3 (comma list) =
        # selective stage remat (models/resnet.py stage_remat)
        remat=(tuple(int(s) for s in
                     sys.argv[sys.argv.index("--remat-stages") + 1].split(","))
               if "--remat-stages" in sys.argv else "--remat" in sys.argv),
        # production scale: --buffer 300 --replay-batch 12
        # (conf/experiments/loss/bacs_plus.yaml)
        buffer_size=_flag("--buffer", 50),
        replay_batch=_flag("--replay-batch", 8),
        image_uint8="--image-uint8" in sys.argv,
        # capacity triage for protocol-shaped footprints
        # (15-1-paper: --batch 6 --accum 2 --resident-mb 1024)
        batch_override=_flag("--batch", 0),
        accum=_flag("--accum", 1),
        resident_mb=_flag("--resident-mb", 0),
    )
