"""Scenario splitter and learner head-surgery tests."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bacs_tpu.data.continual import ContinualScenario, shuffle_class_order
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


def _reference_filter_images(class_sets, increments, class_order, mode):
    """Independent transcription of the reference's membership rule
    (reference: dataset/cityscape_dataset.py:150-201 `_filter_images`,
    itself from Cermelli's MiB utils): overlap = any current-task class
    present; disjoint/sequential = that AND every class in the image is
    current ∪ old ∪ {0, 255}."""
    t = np.zeros((len(class_sets), len(increments)), dtype=bool)
    acc = 0
    for task_id, inc in enumerate(increments):
        labels = class_order[acc : acc + inc]
        old_labels = class_order[:acc]
        all_labels = list(labels) + list(old_labels) + [0, 255]
        for index, classes in enumerate(class_sets):
            if mode == "overlap":
                t[index, task_id] = any(c in labels for c in classes)
            else:  # disjoint / sequential
                t[index, task_id] = any(c in labels for c in classes) and all(
                    c in all_labels for c in classes
                )
        acc += inc
    return t


@pytest.mark.parametrize("initial,inc", [(15, 1), (10, 1), (15, 5), (19, 1)])
@pytest.mark.parametrize("mode", ["overlap", "disjoint", "sequential"])
def test_voc_scenario_grid_matches_reference_rule(initial, inc, mode):
    """The full VOC scenario grid the reference's authors ran
    ({15-1, 10-1, 15-5, 19-1} × {overlap, disjoint, sequential},
    reference: scripts/voc/slurm_train.sh:18-19,68-87): membership must
    be bit-identical to the reference's `_filter_images` rule, and the
    per-task label tables must follow each mode's visibility semantics."""
    rng = np.random.RandomState(initial * 7 + inc)
    class_sets = [
        np.unique(rng.randint(1, 21, size=rng.randint(1, 5)))
        for _ in range(300)
    ]
    s = ContinualScenario(class_sets, initial, inc, 21, mode=mode)
    n_tasks = 1 + (20 - initial) // inc
    assert s.n_tasks == n_tasks

    expected = _reference_filter_images(
        class_sets, [initial] + [inc] * (n_tasks - 1), list(range(1, 21)), mode
    )
    for t in range(n_tasks):
        np.testing.assert_array_equal(
            s.task_indices(t), np.where(expected[:, t])[0],
            err_msg=f"membership diverges at task {t} ({initial}-{inc} {mode})",
        )

    # label-table semantics per mode at every task
    for t in range(n_tasks):
        cur = set(s.task_classes(t))
        seen = set(c for u in range(t + 1) for c in s.task_classes(u))
        train_tab = s.label_table(t, train=True)
        eval_tab = s.label_table(t, train=False)
        assert train_tab[255] == 255 and eval_tab[255] == 255
        for c in range(1, 21):
            visible_train = seen if mode == "sequential" else cur
            assert train_tab[c] == (c if c in visible_train else 0)
            assert eval_tab[c] == (c if c in seen else 0)
        assert s.n_classes_at(t) == 1 + initial + inc * t


@pytest.mark.parametrize("mode", ["overlap", "disjoint"])
def test_scenario_grid_with_shuffled_class_order(mode):
    """Class-order shuffling composes with every mode: membership follows
    the ORDER-sliced class sets and labels are remapped to contiguous ids
    by order position (reference: base_datamodule.py:95-112)."""
    order = shuffle_class_order(21, seed=5)
    rng = np.random.RandomState(11)
    class_sets = [
        np.unique(rng.randint(1, 21, size=rng.randint(1, 4)))
        for _ in range(150)
    ]
    s = ContinualScenario(
        class_sets, 15, 1, 21, mode=mode, class_order=order
    )
    expected = _reference_filter_images(
        class_sets, [15, 1, 1, 1, 1, 1], order, mode
    )
    for t in range(6):
        np.testing.assert_array_equal(
            s.task_indices(t), np.where(expected[:, t])[0]
        )
    # remap: k-th class in the order gets contiguous id k+1
    tab0 = s.label_table(0, train=True)
    for pos, orig in enumerate(order[:15]):
        assert tab0[orig] == pos + 1
    assert s.task_classes_original(5) == [order[19]]


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
