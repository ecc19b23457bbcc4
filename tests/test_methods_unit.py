"""Unit tests for method-specific mechanics (no full Trainer)."""

import jax
import jax.numpy as jnp
import numpy as np

from bacs_tpu.methods.base import label_task_ids, update_task_prototypes
from bacs_tpu.methods.bacs import random_autocontrast
from bacs_tpu.methods.plop import _median_from_histogram
from bacs_tpu.train.state import TaskInfo


def test_label_task_ids_voc_15_1():
    """VOC 15-1: initial 16 classes (bg+15), +1/task
    (reference: base_loss.py:98-107)."""
    task = TaskInfo(task_id=3, initial_classes=16, increment=1, num_classes=21,
                    n_tasks=6)
    labels = jnp.asarray([0, 1, 15, 16, 17, 20])
    tids = np.asarray(label_task_ids(labels, task))
    np.testing.assert_array_equal(tids, [0, 0, 0, 1, 2, 5])


def test_prototype_running_mean():
    task = TaskInfo(task_id=0, initial_classes=3, increment=1, num_classes=5,
                    n_tasks=3)
    protos = jnp.zeros((3, 4))
    counts = jnp.zeros((3,))
    feats = jnp.ones((1, 2, 2, 4)) * 2.0
    labels = jnp.asarray([[[1, 1], [0, 255]]])  # 2 fg pixels of task 0
    p1, c1 = update_task_prototypes(protos, counts, feats, labels, task)
    assert float(c1[0]) == 2.0
    np.testing.assert_allclose(np.asarray(p1[0]), np.full(4, 2.0))
    # second batch with different value folds into the running mean
    feats2 = jnp.ones((1, 2, 2, 4)) * 4.0
    p2, c2 = update_task_prototypes(p1, c1, feats2, labels, task)
    assert float(c2[0]) == 4.0
    np.testing.assert_allclose(np.asarray(p2[0]), np.full(4, 3.0))


def test_plop_median_histogram_literal_reference_behavior():
    """The reference's running-sum accumulates BIN INDICES, not counts
    (training/utils.py:121-127) — replicated literally for parity.

    Low-entropy mass (bin 5) yields a near-bin threshold; mass at high bins
    is overtaken by the index accumulation and clamps to the base threshold.
    """
    hist = np.zeros((3, 100), np.int64)
    hist[0, 5] = 100  # half=50; running_sum after b=4 is 0+1+2+3+4=10
    hist[1, 40] = 100  # index sum exceeds half before bin 40 → degenerate
    t = _median_from_histogram(hist, base_threshold=0.001)
    expected0 = 0.05 + (50 - 10) / 100 * 0.01
    np.testing.assert_allclose(t[0], expected0, rtol=1e-5)
    assert t[1] == 0.001  # clamped (reference behavior)
    assert t[2] == 0.001  # empty class stays at base


def test_random_autocontrast_stretches_when_applied():
    x = jnp.asarray(np.linspace(0.2, 0.6, 4 * 4 * 3, dtype=np.float32)).reshape(
        1, 4, 4, 3
    )
    # find a key where it applies
    for seed in range(10):
        out = random_autocontrast(jax.random.PRNGKey(seed), x, p=1.0)
        break
    assert float(jnp.min(out)) < 0.05 and float(jnp.max(out)) > 0.95


def test_er_same_task_with_bg_detector_three_tasks():
    """ER replay + bg_detector + same_task through 3 tasks must not shape-error:
    the seen-detector trains on the SAMPLED partition's head during replay
    (reference: loss/experience_replay.py:244-272 passes memory task_id)."""
    from bacs_tpu.config.core import load_config
    from bacs_tpu.train.loop import Trainer

    cfg = load_config(
        "conf/continual_debug",
        "config",
        ["loss=er", "training.bg_detector=true"],
    )
    assert cfg["loss"]["same_task"] is True
    trainer = Trainer(cfg)
    miou = trainer.fit()
    assert np.isfinite(miou)
    # per-task partitions were populated (buffer_size slots per task)
    valid = np.asarray(trainer.state.buffer.valid)
    size = trainer.method.buffer_size
    n_tasks = trainer.n_tasks
    for t in range(n_tasks - 1):  # last task's end_task also fills its slice
        assert valid[t * size : (t + 1) * size].any(), f"partition {t} empty"


def test_dark_logits_transplant_semantics():
    """Channels ≥ stored class count come from the current model
    (reference: bacs_loss.py:387-431)."""
    # emulate the transplant math directly
    n_cur = 5
    mem_logits = jnp.arange(2 * 1 * 1 * n_cur, dtype=jnp.float32).reshape(
        2, 1, 1, n_cur
    )
    sem = -jnp.ones((2, 1, 1, n_cur))
    n_classes = jnp.asarray([3, 5])
    ch = jnp.arange(n_cur)[None, None, None, :]
    grow = ch >= n_classes[:, None, None, None]
    out = jnp.where(grow, sem, mem_logits)
    # sample 0: channels 3,4 transplanted; sample 1: untouched
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]), [0, 1, 2, -1, -1])
    np.testing.assert_allclose(np.asarray(out[1, 0, 0]), [5, 6, 7, 8, 9])
