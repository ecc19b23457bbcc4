"""Checkpoint/resume with orbax: the WHOLE train state, per-task layout.

Closes the reference's resume gap (SURVEY.md §5): PL checkpoints carried only
module/optimizer state — buffer contents, prev_model and prototypes were lost
on resume (reference: trainer.py:254-268, bacs_loss.py:147).  Here the entire
TrainState pytree (including the HBM buffer and frozen prev-model params) is
saved; the per-task directory layout `<ckpt_dir>/step_<t>/` and newest-
checkpoint rescan semantics mirror the reference (trainer.py:133-179).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax


def _ckpt_root(ckpt_dir: str) -> str:
    return os.path.abspath(os.path.expanduser(ckpt_dir))


_ASYNC_CKPTR: Any = None


def _async_checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp

        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_pending_saves() -> None:
    """Block until any in-flight async save has committed to disk.  Must
    run before a blocking save to the same tree or before ending a task."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_task_checkpoint(
    ckpt_dir: str, task_id: int, state: Any, step: str = "final",
    block: bool = True,
):
    """Save under `<ckpt_dir>/step_<task_id>/<step>` (reference per-task
    step_N layout, trainer.py:149-170).

    `block=False` uses orbax's AsyncCheckpointer for mid-epoch `last`
    saves: the step loop only pays the device→host snapshot, the disk
    write overlaps training (the reference's in-loop PL saves block).
    """
    import orbax.checkpoint as ocp

    path = os.path.join(_ckpt_root(ckpt_dir), f"step_{task_id}", str(step))
    tree = jax.tree.map(lambda x: x, state)
    if block:
        wait_for_pending_saves()  # never race an async save on the same dir
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path, tree, force=True)
    else:
        ck = _async_checkpointer()
        ck.wait_until_finished()  # serialize: bounds blocking to leftovers
        ck.save(path, tree, force=True)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[tuple[int, str]]:
    """Newest (task_id, path); 'final' checkpoints of finished tasks win over
    mid-task saves, mirroring the reference's `[!f]*.ckpt` resume scan."""
    root = _ckpt_root(ckpt_dir)
    if not os.path.isdir(root):
        return None
    tasks = sorted(
        (
            int(m.group(1))
            for d in os.listdir(root)
            if (m := re.fullmatch(r"step_(\d+)", d))
        ),
        reverse=True,
    )
    for t in tasks:
        step_dir = os.path.join(root, f"step_{t}")
        steps = os.listdir(step_dir)
        if not steps:
            continue
        # a completed task has both `final` and mid-task saves; `final` must
        # win or resume re-runs end_task and re-populates the buffer on top of
        # restored reservoir counters (reference trainer.py:155-157 excludes
        # non-final ckpts only when scanning *unfinished* tasks)
        if "final" in steps:
            return t, os.path.join(step_dir, "final")
        # mid-task saves alternate between two slots (orbax force=True
        # deletes the destination BEFORE the new save commits, so a crash
        # mid-save must still find the other slot) — newest commit wins
        newest = max(
            steps, key=lambda d: os.path.getmtime(os.path.join(step_dir, d))
        )
        return t, os.path.join(step_dir, newest)
    return None


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore into the abstract structure of `target` (a TrainState)."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        # local_devices, not devices: under multihost, devices()[0] is the
        # coordinator's device — non-addressable from other processes, which
        # must restore onto their own first device (state is replicated, so
        # every process restores identical values; replicate_to_global then
        # rebuilds the global arrays at the next task start)
        sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])

        def _as_abstract(x):
            if hasattr(x, "shape") and hasattr(x, "dtype"):
                return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
            return x

        abstract = jax.tree.map(_as_abstract, target)
        return ckptr.restore(path, ocp.args.PyTreeRestore(item=abstract))
