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


def test_reference_transplant_mode_matches_reference_loop():
    """transplant_mode="reference" mirrors the reference's unique/inverse
    indexing exactly (bacs_loss.py:418-427): per unique class-count, only
    the item at `returned_indices[indx]` gets the grown channels."""
    from types import SimpleNamespace

    from bacs_tpu.methods import create_method

    n_cur = 6
    rs = np.random.RandomState(0)
    for n_classes in ([4, 4, 4], [3, 5, 3, 5], [2, 6, 4, 2]):
        B = len(n_classes)
        mem_logits = rs.randn(B, 2, 2, n_cur).astype(np.float32)
        sem = rs.randn(B, 2, 2, n_cur).astype(np.float32)

        # --- python emulation of the reference loop ---
        expected = mem_logits.copy()
        u, inv = np.unique(np.asarray(n_classes), return_inverse=True)
        for indx, val in enumerate(u):
            item = inv[indx]  # the reference's returned_indices[indx]
            if val < n_cur:
                expected[item, ..., val:] = sem[item, ..., val:]
        expected[..., 0] = sem[..., 0]  # ignore_rep_bg
        exp_dark = np.mean((expected - sem) ** 2)

        method = create_method("loss.BACSLoss", transplant_mode="reference")
        ctx = SimpleNamespace(n_cur=n_cur)
        mem = {
            "logits": jnp.asarray(mem_logits),
            "n_classes": jnp.asarray(n_classes, jnp.int32),
        }
        dark = method._dark_from_sem(ctx, jnp.asarray(sem), mem)
        np.testing.assert_allclose(float(dark), exp_dark, rtol=1e-5)


def test_merged_replay_forward_matches_two_forwards(monkeypatch):
    """loss.merged_replay runs α+β through one concatenated forward; with
    both legs sampling the SAME slots the merged batch is a duplication, so
    its BN batch statistics equal each half's and the loss must match the
    two-forward parity path to float tolerance."""
    import bacs_tpu.data.transforms as transforms_mod
    import bacs_tpu.methods.bacs as bacs_mod
    from bacs_tpu.methods import create_method
    from bacs_tpu.methods.base import ModelContext
    from bacs_tpu.models import create_network
    from bacs_tpu.train.state import TrainState

    n_classes, crop, B = 5, 16, 2
    net = create_network("unet", num_classes=n_classes, axis_name=None,
                         num_layers=3, crop_size=crop)
    x = jnp.zeros((B, crop, crop, 3))
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=True,
    )
    task = TaskInfo(task_id=1, initial_classes=3, increment=1,
                    num_classes=n_classes, n_tasks=3, max_epochs=1)
    ctx = ModelContext(model=net, task=task, axis_name=None)
    rs = np.random.RandomState(7)
    mem = {
        "images": jnp.asarray(rs.rand(B, crop, crop, 3).astype(np.float32)),
        "logits": jnp.asarray(rs.rand(B, crop, crop, n_classes).astype(np.float32)),
        "labels": jnp.asarray(rs.randint(0, 3, (B, crop, crop)).astype(np.int32)),
        "n_classes": jnp.full((B,), 3, jnp.int32),
        "indices": jnp.arange(B),
    }
    monkeypatch.setattr(bacs_mod.buffer_lib, "sample",
                        lambda buf, rng, n, task_id=None: mem)
    monkeypatch.setattr(bacs_mod, "random_autocontrast",
                        lambda rng, im, p=0.5: im)
    monkeypatch.setattr(transforms_mod, "replay_augment",
                        lambda rng, im, lab: (im, lab))

    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}), opt_state=None,
        rng=jax.random.PRNGKey(3),
        prototypes=jnp.zeros((3, 128)), proto_counts=jnp.zeros((3,)),
        buffer="sentinel",
    )
    losses = {}
    for merged in (False, True):
        m = create_method("loss.BACSLoss", alpha=0.7, beta=0.3,
                          merged_replay=merged)
        loss, _, _ = m._replay_der_loss(
            ctx, state.params, state, state.batch_stats,
            jax.random.PRNGKey(11), {},
        )
        losses[merged] = float(loss)
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)


def test_penultimate_stats_keys_present_in_batch_stats():
    """end_task's bg-detector double-drift mirror (methods/bacs.py) indexes
    batch_stats by each model's `penultimate_stats_keys` — the declared keys
    must exist for every family or the loud assert there would kill a real
    run at the first task boundary."""
    from bacs_tpu.models import create_network

    crop = 32
    nets = {
        "deeplab": create_network(
            "deeplab", num_classes=4, norm="abn", axis_name=None,
            backbone="resnet18", crop_size=crop, use_bg_detector=True,
        ),
        "transeg": create_network(
            "transeg", num_classes=4, norm="abn", axis_name=None,
            backbone="resnet18", crop_size=crop, use_bg_detector=True,
            transformer={"hidden_dim": 32, "dim_feedforward": 64,
                         "nhead": 2, "num_decoder_layers": 1},
        ),
        "unet": create_network(
            "unet", num_classes=4, norm="abn", axis_name=None,
            num_layers=3, crop_size=crop, use_bg_detector=True,
        ),
    }
    x = jnp.zeros((1, crop, crop, 3))
    for name, net in nets.items():
        variables = net.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            x, train=True,
        )
        bs = variables.get("batch_stats", {})
        keys = net.penultimate_stats_keys
        assert keys, f"{name}: empty penultimate_stats_keys"
        missing = [k for k in keys if k not in bs]
        assert not missing, (
            f"{name}: {missing} not in batch_stats {sorted(bs)}"
        )


def test_boundary_train_mode_controls_population_bn_drift():
    """Parity default: the buffer-population pass drifts BN running stats
    (train-mode forwards + detector double pass, bacs_loss.py:133-203);
    `boundary_train_mode=False` opts out — end_task must then leave
    batch_stats bit-identical while still filling the buffer.  (The drift
    is measurably harmful at small batch/crop: docs/RESULTS.md round-4
    ADE table.)"""
    from bacs_tpu.methods import create_method
    from bacs_tpu.methods.base import ModelContext
    from bacs_tpu.models import create_network
    from bacs_tpu.train.state import TaskInfo, TrainState

    crop, n_classes = 16, 4
    net = create_network(
        "unet", num_classes=n_classes, norm="abn", axis_name=None,
        num_layers=2, crop_size=crop, use_bg_detector=True, n_tasks=2,
    )
    task = TaskInfo(
        task_id=0, initial_classes=3, increment=1, num_classes=n_classes,
        n_tasks=2, max_epochs=2,
    )
    ctx = ModelContext(model=net, task=task, axis_name=None, fused_ce=False)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, crop, crop, 3).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 3, (2, crop, crop)).astype(np.int32))
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x[:1], train=True,
    )
    out = net.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        x[:1], train=False,
    )

    def run(**kw):
        method = create_method(
            "loss.BACSLoss", use_bg_detector=True, alpha=0.5, beta=0.5,
            buffer_size=4, replay_minibatch_size=2, **kw,
        )
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            # copies: end_task donates its state (populate is in-place)
            params=jax.tree.map(jnp.copy, variables["params"]),
            batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
            opt_state=None,
            rng=jax.random.PRNGKey(3),
            prototypes=jnp.zeros((2, out.penultimate.shape[-1])),
            proto_counts=jnp.zeros((2,)),
            buffer=method.init_buffer(
                task, (crop, crop), out.sem_logits.shape[1:3]
            ),
        )
        return method.end_task(state, ctx, [{"image": x, "label": y}])

    before = jax.tree.map(np.asarray, variables["batch_stats"])

    drifted = run()  # parity default: train-mode population
    after = jax.tree.map(np.asarray, drifted.batch_stats)
    flat_a = jax.tree_util.tree_leaves(after)
    flat_b = jax.tree_util.tree_leaves(before)
    moved = [i for i, (a, b) in enumerate(zip(flat_a, flat_b))
             if not np.array_equal(a, b)]
    assert moved, "train-mode population must drift some BN running stat"
    assert bool(drifted.buffer.valid.sum()) > 0

    frozen = run(boundary_train_mode=False)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        frozen.batch_stats, before,
    )
    assert int(frozen.buffer.valid.sum()) == 2  # buffer still populated
