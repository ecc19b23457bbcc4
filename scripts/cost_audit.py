"""HLO cost audit of the 512² train step: bytes/flops totals + biggest ops.

Prints cost_analysis totals for fwd / fwd+bwd / full step, plus the largest
fusions by bytes from the compiled HLO (via as_text scan), to target kernel
work.  Run on the real TPU (serialize: one TPU process at a time).
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bacs_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from bacs_tpu.methods import create_method
from bacs_tpu.methods.base import ModelContext
from bacs_tpu.models import create_network
from bacs_tpu.train.optim import make_optimizer, poly_schedule
from bacs_tpu.train.state import TaskInfo, TrainState
from bacs_tpu.train.step import make_steps

crop, batch = 512, 16
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
    x[:1], train=False,
)
task = TaskInfo(task_id=0, initial_classes=n_classes, increment=0,
                num_classes=n_classes, n_tasks=1, max_epochs=1)
ctx = ModelContext(model=net, task=task, axis_name=None)
method = create_method("loss.CrossEntropy")
tx = make_optimizer(
    {"_target_": "torch.optim.SGD", "lr": 0.01, "momentum": 0.9,
     "nesterov": True, "weight_decay": 1e-4},
    poly_schedule(0.01, 100),
)
state = TrainState(
    step=jnp.zeros((), jnp.int32),
    params=variables["params"],
    batch_stats=variables["batch_stats"],
    opt_state=tx.init(variables["params"]),
    rng=jax.random.PRNGKey(2),
    prototypes=jnp.zeros((1, 2048)),
    proto_counts=jnp.zeros((1,)),
)
train_step, _, _ = make_steps(ctx, method, tx, n_classes, mesh=None)

lowered = jax.jit(
    lambda s, b: train_step.__wrapped__(s, b)
    if hasattr(train_step, "__wrapped__") else None
)
compiled = train_step.lower(state, {"image": x, "label": y}).compile()
ca = compiled.cost_analysis()
print("== full step cost_analysis ==")
for k in sorted(ca):
    v = ca[k]
    if isinstance(v, float) and v > 1e6:
        print(f"  {k}: {v/1e9:.2f} G")

# biggest ops by bytes from the HLO text
txt = compiled.as_text()
sizes = []
for m in re.finditer(r"(\w+)\s*=\s*(bf16|f32|s32|u8|pred)\[([\d,]*)\]", txt):
    dtype = m.group(2)
    dims = [int(d) for d in m.group(3).split(",") if d]
    if not dims:
        continue
    bpe = {"bf16": 2, "f32": 4, "s32": 4, "u8": 1, "pred": 1}[dtype]
    sizes.append((np.prod(dims) * bpe, m.group(0)[:110]))
sizes.sort(reverse=True)
print("== 30 biggest tensors in HLO ==")
seen = set()
for sz, desc in sizes[:120]:
    key = desc.split("=")[1][:80]
    if key in seen:
        continue
    seen.add(key)
    print(f"  {sz/1e6:8.1f} MB  {desc}")
    if len(seen) >= 30:
        break

# dtype histogram of tensor bytes
tot = {}
for m in re.finditer(r"(bf16|f32|s32|u8|pred)\[([\d,]+)\]", txt):
    dims = [int(d) for d in m.group(2).split(",") if d]
    bpe = {"bf16": 2, "f32": 4, "s32": 4, "u8": 1, "pred": 1}[m.group(1)]
    tot[m.group(1)] = tot.get(m.group(1), 0) + np.prod(dims) * bpe
print("== total tensor bytes by dtype (all HLO mentions) ==")
for k, v in sorted(tot.items(), key=lambda kv: -kv[1]):
    print(f"  {k}: {v/1e9:.1f} GB")

# timing sanity
def sync(o):
    return float(jax.tree.leaves(o)[1]["loss"]) if isinstance(o, tuple) else float(o)

state2, m = train_step(state, {"image": x, "label": y})
float(m["loss"])
t0 = time.perf_counter()
N = 10
s = state
for _ in range(N):
    s, m = train_step(s, {"image": x, "label": y})
float(m["loss"])
dt = (time.perf_counter() - t0) / N
print(f"step time: {dt*1e3:.1f} ms  ({batch/dt:.1f} img/s)")
