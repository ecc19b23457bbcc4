"""Checkpoint save/restore roundtrip incl. buffer + prev-model state."""

import os
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
