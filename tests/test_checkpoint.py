"""Checkpoint save/restore roundtrip incl. buffer + prev-model state."""

import os
import pytest
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from bacs_tpu.train import buffer as buffer_lib
from bacs_tpu.train.state import TrainState
from bacs_tpu.utils.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_task_checkpoint,
)


def _state(with_prev=True):
    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    buf = buffer_lib.init_buffer(4, (4, 4), (2, 2), 5)
    buf = buffer_lib.add_batch(
        buf, jax.random.PRNGKey(0),
        jnp.ones((2, 4, 4, 3)), jnp.ones((2, 2, 2, 5)),
        jnp.ones((2, 4, 4), jnp.int32), jnp.ones((2,)), 0, 3,
    )
    return TrainState(
        step=jnp.asarray(7, jnp.int32),
        params=params,
        batch_stats={"bn": {"mean": jnp.ones((3,))}},
        opt_state=None,
        rng=jax.random.PRNGKey(3),
        prototypes=jnp.ones((2, 3)) * 2,
        proto_counts=jnp.asarray([1.0, 0.0]),
        prev_params=(
            jax.tree.map(lambda x: x + 1, params) if with_prev else None
        ),
        prev_batch_stats={"bn": {"mean": jnp.zeros((3,))}} if with_prev else None,
        buffer=buf,
        epoch=jnp.asarray(4, jnp.int32),
    )


def test_roundtrip_preserves_all_cl_state():
    state = _state()
    with tempfile.TemporaryDirectory() as d:
        save_task_checkpoint(d, 1, state, "final")
        found = latest_checkpoint(d)
        assert found is not None
        t, path = found
        assert t == 1 and path.endswith("final")
        template = _state()
        restored = restore_checkpoint(path, jax.tree.map(jnp.zeros_like, template))
        assert int(restored.step) == 7
        assert int(restored.epoch) == 4
        np.testing.assert_allclose(
            np.asarray(restored.prototypes), np.asarray(state.prototypes)
        )
        np.testing.assert_allclose(
            np.asarray(restored.prev_params["w"]),
            np.asarray(state.prev_params["w"]),
        )
        assert int(restored.buffer.num_seen) == 2
        np.testing.assert_array_equal(
            np.asarray(restored.buffer.valid), np.asarray(state.buffer.valid)
        )


def test_latest_prefers_newest_task():
    state = _state(with_prev=False)
    with tempfile.TemporaryDirectory() as d:
        save_task_checkpoint(d, 0, state, "final")
        save_task_checkpoint(d, 1, state, "last")
        t, path = latest_checkpoint(d)
        assert t == 1 and path.endswith("last")


def test_final_wins_over_last_within_a_task():
    """A completed task saves both `last` (per-epoch) and `final`; resume must
    pick `final` (task done → start at t+1) or end_task would re-run and
    re-populate the buffer on top of restored reservoir counters."""
    state = _state(with_prev=False)
    with tempfile.TemporaryDirectory() as d:
        save_task_checkpoint(d, 1, state, "last")
        save_task_checkpoint(d, 1, state, "final")
        t, path = latest_checkpoint(d)
        assert t == 1 and path.endswith("final")


def test_mid_epoch_checkpoint_and_resume(tmp_path):
    """Kill a run mid-epoch; resume restarts the same epoch within
    ckpt_every_steps batches (reference cadence: 2 saves/epoch,
    trainer.py:190-201)."""
    from bacs_tpu.config.core import load_config
    from bacs_tpu.train.loop import Trainer

    ckpt = str(tmp_path / "ckpt")
    cfg = load_config(
        "conf/continual_debug",
        "config",
        [
            "training.debug=false",
            "training.epochs=2",
            f"+training.ckpt_dir={ckpt}",
            "+training.ckpt_every_steps=2",
        ],
    )
    trainer = Trainer(cfg)

    class Killed(Exception):
        pass

    dm = trainer.datamodule
    orig = dm.train_batches

    def dying_batches(epoch, n_devices=1, **kw):
        for i, b in enumerate(orig(epoch=epoch, n_devices=n_devices, **kw)):
            if i == 3:  # crash after 3 batches (one mid-epoch save at i=2)
                raise Killed()
            yield b

    dm.train_batches = dying_batches
    with np.testing.assert_raises(Killed):
        trainer._run_task(0)
    dm.train_batches = orig
    from bacs_tpu.utils.checkpoint import wait_for_pending_saves

    wait_for_pending_saves()  # saves are async; the exception outran it
    slots = os.listdir(os.path.join(ckpt, "step_0"))
    assert any(d.startswith("last") for d in slots), slots

    trainer2 = Trainer(cfg)
    start = trainer2._try_resume()
    assert start == 0
    assert trainer2._resume_epoch == 0
    assert int(trainer2.state.epoch_step) == 2  # within ckpt_every of the kill
    miou = trainer2.fit()
    assert np.isfinite(miou)
    # crash+resume must train exactly as many optimizer steps as an
    # uninterrupted run (the 2 pre-crash steps are skipped, not re-run)
    cfg_ref = load_config(
        "conf/continual_debug", "config",
        ["training.debug=false", "training.epochs=2"],
    )
    ref = Trainer(cfg_ref)
    ref.fit()
    assert int(trainer2.state.step) == int(ref.state.step)


def test_mid_epoch_checkpoint_fires_with_multi_step_dispatch(tmp_path):
    """ckpt_every not divisible by steps_per_dispatch: the save must fire at
    the first dispatch past each boundary (an exact modulo test would never
    match — the save block is only reached when a dispatch fires)."""
    from bacs_tpu.config.core import load_config
    from bacs_tpu.train.loop import Trainer

    ckpt = str(tmp_path / "ckpt")
    cfg = load_config(
        "conf/continual_debug",
        "config",
        [
            "training.debug=false",
            "training.epochs=1",
            "dataset.dataset.n_train=48",  # task 0 needs > 6 train batches
            f"+training.ckpt_dir={ckpt}",
            "+training.ckpt_every_steps=3",
            "+training.steps_per_dispatch=2",
        ],
    )
    trainer = Trainer(cfg)

    class Killed(Exception):
        pass

    dm = trainer.datamodule
    orig = dm.train_batches

    def dying_batches(epoch, n_devices=1, **kw):
        for i, b in enumerate(orig(epoch=epoch, n_devices=n_devices, **kw)):
            if i == 5:  # boundary at i+1==3; dispatch at i==3 saves (4 done)
                raise Killed()
            yield b

    dm.train_batches = dying_batches
    with np.testing.assert_raises(Killed):
        trainer._run_task(0)
    dm.train_batches = orig
    from bacs_tpu.utils.checkpoint import wait_for_pending_saves

    wait_for_pending_saves()
    slots = os.listdir(os.path.join(ckpt, "step_0"))
    assert any(d.startswith("last") for d in slots), slots

    trainer2 = Trainer(cfg)
    assert trainer2._try_resume() == 0
    assert int(trainer2.state.epoch_step) == 4


def test_completed_task_resume_starts_next_task(tmp_path, monkeypatch):
    """End-to-end: a run killed after task 0's `final` (but with a stale
    `last` in the same step dir) resumes at task 1 without re-running task 0's
    end_task (buffer is restored, not re-populated)."""
    from bacs_tpu.config.core import load_config
    from bacs_tpu.train.loop import Trainer

    ckpt = str(tmp_path / "ckpt")
    cfg = load_config(
        "conf/continual_debug",
        "config",
        [
            "loss=bacs",
            "training.bg_detector=true",
            "training.debug=false",  # debug disables resume (trainer.py:261)
            f"+training.ckpt_dir={ckpt}",
        ],
    )
    trainer = Trainer(cfg)
    # run only task 0 (run_task includes end_task + final save)
    trainer.per_step_metric.task_id = 0
    trainer._run_task(0)
    buf_valid = np.asarray(trainer.state.buffer.valid).copy()
    num_seen = int(trainer.state.buffer.num_seen)
    assert os.path.isdir(os.path.join(ckpt, "step_0", "final"))
    slots = os.listdir(os.path.join(ckpt, "step_0"))
    assert any(d.startswith("last") for d in slots), slots  # stale last slot

    trainer2 = Trainer(cfg)
    calls = []
    orig_end_task = trainer2.method.end_task

    def spy_end_task(state, ctx, batches):
        calls.append(ctx.task.task_id)
        return orig_end_task(state, ctx, batches)

    trainer2.method.end_task = spy_end_task
    start = trainer2._try_resume()
    assert start == 1, "resume after a completed task must start at task 1"
    assert int(trainer2.state.buffer.num_seen) == num_seen
    np.testing.assert_array_equal(
        np.asarray(trainer2.state.buffer.valid), buf_valid
    )
    assert calls == [], "end_task must not re-run for the completed task"

def test_strict_restore_raises_on_structure_drift(tmp_path):
    """training.strict_restore=true: checkpoint structure drift raises
    instead of silently restarting from scratch (round-4 weak item —
    loop.py previously only logged a line)."""
    from bacs_tpu.config.core import load_config
    from bacs_tpu.train.loop import Trainer
    from bacs_tpu.utils.checkpoint import wait_for_pending_saves

    ckpt = str(tmp_path / "ckpt")
    cfg = load_config(
        "conf/continual_debug", "config",
        ["training.debug=false", "training.epochs=1",
         f"+training.ckpt_dir={ckpt}"],
    )
    Trainer(cfg).fit()
    wait_for_pending_saves()

    # different network → template tree no longer matches the checkpoint
    drifted = load_config(
        "conf/continual_debug", "config",
        ["training.debug=false", "training.epochs=1",
         f"+training.ckpt_dir={ckpt}", "network.num_layers=3",
         "+training.strict_restore=true"],
    )
    trainer = Trainer(drifted)
    with pytest.raises(RuntimeError, match="strict_restore"):
        trainer._try_resume()

    # default (non-strict) keeps the old behavior: fresh start, task 0
    lax_cfg = load_config(
        "conf/continual_debug", "config",
        ["training.debug=false", "training.epochs=1",
         f"+training.ckpt_dir={ckpt}", "network.num_layers=3"],
    )
    lax = Trainer(lax_cfg)
    assert lax._try_resume() == 0
    assert lax.state is None
