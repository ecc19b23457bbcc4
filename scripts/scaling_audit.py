"""Compile-level mesh-scaling audit: which collectives does XLA insert,
and how does per-device work scale with the mesh?

Multi-chip hardware is not reachable from this host, but the SPMD program
XLA builds for each mesh IS — so we audit the compiled HLO the way the
scaling-book recipe prescribes (pick a mesh, annotate shardings, let XLA
insert collectives, inspect): for dp in {1,2,4,8} (weak scaling — one
image per device) and the dp=4 x sp=2 GSPMD spatial leg, compile the real
train step on a virtual CPU mesh and report

  * per-device FLOPs and HBM bytes from `compiled.cost_analysis()`,
  * every collective op in the optimized HLO (count + payload bytes),
  * the gradient all-reduce payload vs the model's parameter bytes.

Expected shape of the result (asserted by tests/test_scaling_audit.py):
per-device FLOPs stay ~constant as dp grows (weak scaling), the all-reduce
payload stays ~param-bytes-sized (the ICI cost of DP is independent of
dp), and the spatial leg adds collective-permute halo exchanges for the
convolutions (reference has no analogue: DDP cannot shard one image —
SURVEY.md §2.9).

Run:  python scripts/scaling_audit.py            # full table (~2 min CPU)
      python scripts/scaling_audit.py --one dp=4 # single config, JSON line
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = ["dp=1", "dp=2", "dp=4", "dp=8", "dp=4,sp=2", "dp=8,bacs"]

_COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)

# f32[4,32,32,3]{...} etc. inside an HLO op signature
_SHAPE_RE = re.compile(r"(bf16|f16|f32|f64|s8|u8|s32|u32|s64|pred)\[([\d,]*)\]")
_BYTES = {"bf16": 2, "f16": 2, "f32": 4, "f64": 8, "s8": 1, "u8": 1,
          "s32": 4, "u32": 4, "s64": 8, "pred": 1}


def _result_bytes(line: str) -> int:
    """Payload of an HLO op line = bytes of its result shape(s)."""
    rhs = line.split(" = ", 1)[1] if " = " in line else line
    m = _SHAPE_RE.search(rhs)
    if not m:
        return 0
    # tuple results: sum every shape up to the op name parenthesis
    head = rhs.split(")", 1)[0] if rhs.startswith("(") else m.group(0)
    total = 0
    for dt, dims in _SHAPE_RE.findall(head):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _BYTES[dt]
    return total


def audit_one(config: str) -> dict:
    dp, sp, method_name = 1, 1, "crossentropy"
    for part in config.split(","):
        if part.startswith("dp="):
            dp = int(part[3:])
        elif part.startswith("sp="):
            sp = int(part[3:])
        elif part == "bacs":
            method_name = "bacs"
    n_devices = dp * sp

    import __graft_entry__ as graft

    graft._force_cpu_devices(n_devices)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from bacs_tpu.methods import create_method
    from bacs_tpu.methods.base import ModelContext
    from bacs_tpu.models import create_network
    from bacs_tpu.train.optim import make_optimizer, poly_schedule
    from bacs_tpu.train.state import TaskInfo, TrainState
    from bacs_tpu.train.step import make_gspmd_steps, make_steps
    from bacs_tpu.train import buffer as buffer_lib

    crop, n_classes, n_tasks = 32, 6, 3
    spatial = sp > 1
    axis = None if spatial else "data"
    net = create_network(
        "deeplab", backbone="resnet18", num_classes=n_classes,
        n_tasks=n_tasks, use_bg_detector=(method_name == "bacs"),
        norm="iabn_sync", axis_name=axis, crop_size=crop,
    )
    task = TaskInfo(task_id=1, initial_classes=4, increment=1,
                    num_classes=n_classes, n_tasks=n_tasks, max_epochs=1)
    if spatial:
        from bacs_tpu.parallel.mesh import make_spatial_mesh

        mesh = make_spatial_mesh(sp, n_devices)
        ctx = ModelContext(model=net, task=task, axis_name=None,
                           fused_ce=True, spatial_mesh=mesh)
    else:
        mesh = Mesh(np.array(jax.devices()[:n_devices]), ("data",))
        ctx = ModelContext(model=net, task=task, axis_name="data")

    if method_name == "bacs":
        method = create_method("loss.BACSLoss", use_bg_detector=True,
                               buffer_size=8, replay_minibatch_size=2,
                               alpha=0.5, beta=0.5)
    else:
        method = create_method("loss.CrossEntropy")
    tx = make_optimizer(
        {"_target_": "torch.optim.SGD", "lr": 0.01, "momentum": 0.9,
         "nesterov": True, "weight_decay": 1e-4},
        poly_schedule(0.01, 10),
    )
    x = jnp.zeros((n_devices, crop, crop, 3), jnp.float32)
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=True,
    )
    params = variables["params"]
    param_bytes = sum(
        v.size * v.dtype.itemsize for v in jax.tree.leaves(params)
    )
    out = net.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        x, train=False,
    )
    state_kw = {}
    if method_name == "bacs":
        buf = method.init_buffer(task, (crop, crop), out.sem_logits.shape[1:3])
        buf = buffer_lib.add_batch(
            buf, jax.random.PRNGKey(2),
            jnp.zeros((4, crop, crop, 3)),
            jnp.zeros((4,) + tuple(out.sem_logits.shape[1:3]) + (n_classes,)),
            jnp.zeros((4, crop, crop), jnp.int32),
            jnp.zeros((4,)), task_id=0, n_classes=4,
        )
        state_kw = dict(
            prev_params=jax.tree.map(jnp.copy, params),
            prev_batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
            buffer=buf,
        )
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats=variables["batch_stats"], opt_state=tx.init(params),
        rng=jax.random.PRNGKey(3),
        prototypes=jnp.ones((n_tasks, out.penultimate.shape[-1])) * 0.1,
        proto_counts=jnp.ones((n_tasks,)),
        **state_kw,
    )
    factory = make_gspmd_steps if spatial else make_steps
    train_step, _, put_batch = factory(ctx, method, tx, n_classes, mesh=mesh)
    batch = put_batch({
        "image": jnp.ones((n_devices // sp if spatial else n_devices,
                           crop, crop, 3), jnp.float32),
        "label": jnp.zeros((n_devices // sp if spatial else n_devices,
                            crop, crop), jnp.int32).at[:, :8, :8].set(4),
    })
    compiled = train_step.lower(state, batch).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    hlo = compiled.as_text()
    dump = os.environ.get("SCALING_AUDIT_DUMP_HLO")
    if dump:
        with open(dump, "w") as f:
            f.write(hlo)

    coll = {}
    payload = {}
    for line in hlo.splitlines():
        s = line.strip()
        if " = " not in s:
            continue
        for c in _COLLECTIVES:
            # the op token is ' <name>(' after the result shape(s); count
            # '-start' variants but not '-done' (avoids double counting
            # async pairs)
            if re.search(rf" {c}(-start)?\(", s):
                coll[c] = coll.get(c, 0) + 1
                payload[c] = payload.get(c, 0) + _result_bytes(s)
                break
    return {
        "config": config,
        "n_devices": n_devices,
        "method": method_name,
        "per_device_gflops": round(float(cost.get("flops", 0)) / 1e9, 3),
        "per_device_mbytes": round(
            float(cost.get("bytes accessed", 0)) / 1e6, 1),
        "param_mbytes": round(param_bytes / 1e6, 2),
        "collectives": coll,
        "collective_payload_mbytes": {
            k: round(v / 1e6, 2) for k, v in payload.items()
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", default=None, help="audit a single config")
    ap.add_argument("--configs",
                    default="dp=1;dp=2;dp=4;dp=8;dp=4,sp=2;dp=8,bacs",
                    help="semicolon-separated config list")
    args = ap.parse_args()

    if args.one:
        print(json.dumps(audit_one(args.one)))
        return

    results = []
    # comma inside a config separates dp/sp flags; top-level split is ';';
    # one subprocess per config because the virtual device count is fixed
    # at backend init
    for config in args.configs.split(";"):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", config],
            capture_output=True, text=True, timeout=900,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(f"# {config} FAILED:\n{proc.stderr[-2000:]}", file=sys.stderr)
            continue
        r = json.loads(line[-1])
        results.append(r)
        print(json.dumps(r))

    if not results:
        sys.exit(1)
    print("\n## Mesh scaling audit (compiled SPMD programs, virtual CPU mesh)\n")
    print("| Config | method | per-device GFLOPs | per-device MB | "
          "collectives (count / payload MB) |")
    print("|---|---|---:|---:|---|")
    for r in results:
        cstr = "; ".join(
            f"{k} x{v} / {r['collective_payload_mbytes'].get(k, 0)}"
            for k, v in sorted(r["collectives"].items())
        ) or "none"
        print(f"| {r['config']} | {r['method']} | {r['per_device_gflops']} | "
              f"{r['per_device_mbytes']} | {cstr} |")
    print(f"\nparams: {results[0]['param_mbytes']} MB — the DP all-reduce "
          "payload should stay at this size regardless of dp (ICI cost of "
          "data parallelism is independent of the mesh).")


if __name__ == "__main__":
    main()
