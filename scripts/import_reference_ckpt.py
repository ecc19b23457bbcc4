"""Import a reference PyTorch-Lightning checkpoint into a bacs_tpu run.

The migration path for users of the reference framework
(mostafaelaraby/BACS-Continual-Semantic-Segmentation): take a checkpoint
written by the reference's per-task loop (`<ckpt_dir>/step_<t>/final.ckpt`,
reference: training/trainer.py:404 `trainer.save_checkpoint`) and convert it
into this repo's orbax layout, so that

- `python main.py --config-path ... training.ckpt_dir=<out>` RESUMES the
  continual run at task t+1 with the imported weights, and
- `python predict.py --checkpoint <out> ...` serves them.

What is converted: the full network (backbone + ASPP/transformer/UNet
decoder + classifier head(s) + BgDetector) via the weight-converters that the
torch↔JAX parity harness proves exact (bacs_tpu/utils/torch_weights.py;
tests/test_reference_parity.py).  Per-task ModuleList heads
(`network.classifier_head.<t>.weight`, reference: networks/base_network.py:
99-118) are concatenated into this repo's padded single head.

What is NOT in the reference checkpoint and therefore freshly initialized:
optimizer state (a resumed task builds a fresh schedule anyway, reference:
trainer.py:394), the replay buffer, and prototypes — the reference itself
loses these on resume and re-populates the buffer at the next task boundary
(reference: loss/bacs_loss.py:147).  Pass `--populate-buffer` to run this
repo's `method.end_task` (the reference's `on_train_end` equivalent) over the
canonical train stream with the imported weights, which fills the buffer and
freezes the prev-model exactly as if task t had just finished here.

Usage:
    python scripts/import_reference_ckpt.py \
        --ckpt /path/to/step_0/final.ckpt \
        --config-path conf/bacs --config-name bacs_plus_config \
        --out checkpoints/imported [--task-id 0] [--populate-buffer] \
        [training.batch_size=4 ...]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _strip_module_prefix(sd):
    """PL checkpoints prefix every key with the module attribute name
    (`network.` — reference: training/model.py:34 `self.network = network`)."""
    if any(k.startswith("network.") for k in sd):
        sd = {k[len("network."):]: v for k, v in sd.items() if
              k.startswith("network.")}
    return sd


def _merge_multihead(sd, prefix="classifier_head"):
    """Concatenate per-task ModuleList head convs into single
    `<prefix>.weight/.bias` keys (reference: base_network.py:108-113 concats
    per-task head outputs over the channel dim at forward time)."""
    import numpy as np

    rows = {}
    for k in list(sd):
        m = re.fullmatch(rf"{re.escape(prefix)}\.(\d+)\.(weight|bias)", k)
        if m:
            rows.setdefault(int(m.group(1)), {})[m.group(2)] = sd.pop(k)
    if rows:
        idxs = sorted(rows)
        sd[f"{prefix}.weight"] = np.concatenate(
            [rows[i]["weight"] for i in idxs], axis=0)
        sd[f"{prefix}.bias"] = np.concatenate(
            [rows[i]["bias"] for i in idxs], axis=0)
    return sd, (max(rows) + 1 if rows else None)


def import_reference_checkpoint(
    ckpt_path: str,
    config,
    out_dir: str,
    task_id: int | None = None,
    populate_buffer: bool = False,
    datamodule=None,
):
    """Returns (state, task_id, n_tensors_loaded). Writes
    `<out_dir>/step_<task_id>/final`."""
    import jax
    import jax.numpy as jnp

    from bacs_tpu.methods.base import ModelContext
    from bacs_tpu.train.loop import Trainer
    from bacs_tpu.utils.checkpoint import save_task_checkpoint
    from bacs_tpu.utils.torch_weights import (
        convert_reference_deeplab,
        convert_reference_transeg,
        convert_reference_unet,
        load_torch_state_dict,
    )

    trainer = Trainer(config, datamodule=datamodule)
    sd = _strip_module_prefix(load_torch_state_dict(ckpt_path))
    sd, n_heads = _merge_multihead(sd)

    if task_id is None:
        if n_heads is not None:
            task_id = n_heads - 1  # one ModuleList head per completed task
        else:
            task_id = 0
            if trainer.continual:
                print(
                    "WARNING: single-head checkpoint — cannot infer the task "
                    "id from head count; assuming --task-id 0.  Pass "
                    "--task-id explicitly for SingleHead continual runs."
                )

    trainer.datamodule.set_task_id(task_id)
    task = trainer._task_info(task_id)
    model = trainer._make_model(task)
    tx = trainer._make_tx(task)
    state = trainer._init_state(model, tx, task)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    target = str(config.get("network", {}).get("_target_", "networks.DeepLabV3"))
    if target.endswith("UNet"):
        params, stats, loaded = convert_reference_unet(sd, variables)
    elif target.endswith("TranSeg"):
        params, stats, loaded = convert_reference_transeg(sd, variables)
    else:
        params, stats, loaded = convert_reference_deeplab(sd, variables)
    total = len([k for k in sd if not k.endswith("num_batches_tracked")])
    state = state.replace(params=params, batch_stats=stats)

    method = trainer.method
    if populate_buffer:
        # the reference's own post-resume story: on_train_end re-populates
        # the buffer + clones prev_model (loss/bacs_loss.py:133-203)
        # axis-FREE model: end_task runs plain single-device jits, so a
        # sync-BN pmean bound to the trainer's mesh axis would hit an
        # unbound named axis here (mirrors loop.py's boundary_ctx)
        ctx = ModelContext(
            model=trainer._make_model(task, axis_name=None), task=task,
            axis_name=None, fused_ce=trainer.fused_ce, spatial_mesh=None,
        )
        state = method.end_task(
            state, ctx,
            trainer.datamodule.train_batches(
                epoch=0, n_devices=1, augment=False
            ),
        )
    elif method.needs_prev_model:
        # a `final` checkpoint means task t completed → the next task's
        # distillation teacher is this model (reference: model.clone() at
        # on_train_end)
        state = state.replace(
            prev_params=jax.tree.map(jnp.copy, params),
            prev_batch_stats=jax.tree.map(jnp.copy, stats),
        )

    path = save_task_checkpoint(out_dir, task_id, state, "final")
    return state, task_id, loaded, total, path


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Convert a reference PL checkpoint to a bacs_tpu run dir"
    )
    parser.add_argument("--ckpt", required=True,
                        help="reference .ckpt (PL or bare state_dict)")
    parser.add_argument("--config-path", default="conf/joint_debug")
    parser.add_argument("--config-name", default="config")
    parser.add_argument("--out", required=True,
                        help="bacs_tpu checkpoint dir to create")
    parser.add_argument("--task-id", type=int, default=None,
                        help="task the checkpoint completed (default: "
                             "inferred from the per-task head count)")
    parser.add_argument("--populate-buffer", action="store_true",
                        help="run method.end_task over the train stream to "
                             "fill the replay buffer / prototypes / teacher")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])

    from bacs_tpu.config import load_config
    from bacs_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    config = load_config(args.config_path, args.config_name, args.overrides)
    _, task_id, loaded, total, path = import_reference_checkpoint(
        args.ckpt, config, args.out,
        task_id=args.task_id, populate_buffer=args.populate_buffer,
    )
    print(f"imported {loaded}/{total} tensors from {args.ckpt} "
          f"as completed task {task_id}: {path}")
    print(f"resume:  python main.py --config-path {args.config_path} "
          f"--config-name {args.config_name} +training.ckpt_dir={args.out}")
    print(f"serve:   python predict.py --config-path {args.config_path} "
          f"--config-name {args.config_name} --checkpoint {args.out} ...")


if __name__ == "__main__":
    main()
