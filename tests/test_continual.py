"""Scenario splitter and learner head-surgery tests."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from bacs_tpu.data.continual import ContinualScenario
from bacs_tpu.train.learner import multihead_init
from bacs_tpu.train.state import TaskInfo, TrainState


def _scenario(mode):
    # 6 classes (bg + 5 fg), 3-1-1 split → 3 tasks
    class_sets = [
        np.array([1]),        # only task-0 class
        np.array([1, 4]),     # task-0 + task-1 class
        np.array([4]),        # only task-1
        np.array([5]),        # only task-2
        np.array([2, 3]),     # task-0 only
        np.array([1, 5]),     # task-0 + task-2
    ]
    return ContinualScenario(class_sets, 3, 1, 6, mode=mode)


def test_overlap_membership():
    s = _scenario("overlap")
    assert s.n_tasks == 3
    np.testing.assert_array_equal(s.task_indices(0), [0, 1, 4, 5])
    np.testing.assert_array_equal(s.task_indices(1), [1, 2])
    np.testing.assert_array_equal(s.task_indices(2), [3, 5])


def test_disjoint_membership_excludes_future_classes():
    s = _scenario("disjoint")
    # image 1 has class 4 (future at task 0) → excluded; image 5 has class 5
    np.testing.assert_array_equal(s.task_indices(0), [0, 4])
    np.testing.assert_array_equal(s.task_indices(1), [1, 2])
    np.testing.assert_array_equal(s.task_indices(2), [3, 5])


def test_label_tables_by_mode():
    s = _scenario("disjoint")
    t1 = s.label_table(1, train=True)
    # at task 1, only class 4 visible; old classes → bg
    assert t1[4] == 4 and t1[1] == 0 and t1[255] == 255
    seq = _scenario("sequential")
    t1s = seq.label_table(1, train=True)
    assert t1s[4] == 4 and t1s[1] == 1  # sequential keeps old labels
    # eval: classes of tasks 0..1 visible, future → 0
    te = s.label_table(1, train=False)
    assert te[1] == 1 and te[4] == 4 and te[5] == 0


def test_class_order_remap():
    s = ContinualScenario(
        [np.array([3]), np.array([1])], 1, 1, 3, mode="overlap",
        class_order=[3, 1],
    )
    # class 3 is first in order → new id 1 (task 0); class 1 → id 2 (task 1)
    assert s.task_classes_original(0) == [3]
    assert s.label_table(0, train=True)[3] == 1
    assert s.label_table(1, train=True)[1] == 2


def test_multihead_mib_init():
    """(reference: learner/multiheadlearner.py:13-36)"""
    d, c = 4, 6
    kernel = jnp.asarray(np.random.RandomState(0).randn(1, 1, d, c), jnp.float32)
    bias = jnp.arange(c, dtype=jnp.float32)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params={"classifier_head": {"kernel": kernel, "bias": bias}},
        batch_stats={},
        opt_state=None,
        rng=jax.random.PRNGKey(0),
        prototypes=jnp.zeros((3, d)),
        proto_counts=jnp.zeros((3,)),
    )
    task = TaskInfo(task_id=1, initial_classes=4, increment=1, num_classes=6,
                    n_tasks=3)
    new = multihead_init(state, task)
    nk = new.params["classifier_head"]["kernel"]
    nb = new.params["classifier_head"]["bias"]
    # new class row = bg row; bias = bg_bias - log(n_new + 1); bg bias too
    np.testing.assert_allclose(np.asarray(nk[..., 4]), np.asarray(kernel[..., 0]))
    expected_bias = 0.0 - math.log(2)
    np.testing.assert_allclose(float(nb[4]), expected_bias, rtol=1e-6)
    np.testing.assert_allclose(float(nb[0]), expected_bias, rtol=1e-6)
    # untouched classes keep their rows
    np.testing.assert_allclose(np.asarray(nk[..., 2]), np.asarray(kernel[..., 2]))


def test_voc_15_1_shapes():
    """VOC 15-1: 21 classes, initial 15 fg + 1/task → 6 tasks
    (reference scenario grid, scripts/voc/slurm_train.sh:18-19)."""
    rng = np.random.RandomState(0)
    # synthetic class sets: each image holds 1-3 fg classes
    class_sets = [
        np.unique(rng.randint(1, 21, size=rng.randint(1, 4)))
        for _ in range(200)
    ]
    s = ContinualScenario(class_sets, 15, 1, 21, mode="overlap")
    assert s.n_tasks == 6
    assert s.task_classes(0) == list(range(1, 16))
    assert s.task_classes(5) == [20]
    assert s.n_classes_at(0) == 16 and s.n_classes_at(5) == 21
    # train table at task 3: only class 18 visible
    t3 = s.label_table(3, train=True)
    assert t3[18] == 18 and t3[17] == 0 and t3[1] == 0
    # eval table at task 3: classes 1..18 visible, 19/20 future → bg
    e3 = s.label_table(3, train=False)
    assert e3[18] == 18 and e3[1] == 1 and e3[19] == 0 and e3[20] == 0
    # every task has at least some images under overlap
    for t in range(6):
        assert len(s.task_indices(t)) > 0


def test_domain_shifted_source_applies_real_appearance_shift():
    """Synthetic domains must DIFFER in appearance (else domain
    forgetting is unmeasurable) while labels stay untouched."""
    from bacs_tpu.data.datasets import DomainShiftedSource, SyntheticSource

    base = SyntheticSource(4, 16, 4, seed=3)
    d0 = DomainShiftedSource(base, [0, 0, 0, 0])
    d1 = DomainShiftedSource(base, [1, 1, 1, 1])
    img0, lbl0 = d0.load(0)
    img1, lbl1 = d1.load(0)
    np.testing.assert_array_equal(lbl0, lbl1)  # labels untouched
    assert np.abs(img0.astype(int) - img1.astype(int)).mean() > 5.0
    # deterministic per domain
    img0b, _ = d0.load(0)
    np.testing.assert_array_equal(img0, img0b)
