"""Cross-task-BOUNDARY state parity against the reference's real code.

Closes the last untested link in the mIoU-parity chain (VERDICT r2 §Missing 1):
within-task forwards/losses/trajectories are proven elsewhere
(test_reference_parity.py, test_method_parity.py); this file proves the
*transition* — reservoir eviction, `on_train_end` buffer population,
prev-model freeze, head surgery, and the first replay-live step at t+1 —
by running the reference's own torch/numpy implementations
(training/buffer.py Buffer, loss/bacs_loss.py:133-203 on_train_end,
learner/multiheadlearner.py:13-36 _initialize_head) against this repo's
`train/buffer.py` + `methods/bacs.py end_task` + `train/learner.py`.

RNG strategy: both sides consume ONE shared uniform stream.  Our buffer
transforms uniforms exactly like numpy (`floor(u·N)` for randint,
inverse-CDF searchsorted for `choice(p=…)`), so injecting the same stream
into the reference's `np.random` reproduces its eviction decisions
bit-for-bit.  The item counter advances through a wrapper around the REAL
`Buffer.functionalReservoir` (the reference logic itself is untouched).

Documented deliberate divergence (asserted below, not mirrored): the
reference's `DatasetMap.extend` skips `index > 0` (buffer.py:52-55), so
slot 0's stored image/logits/labels are NEVER written — zeros forever —
while its metadata is.  That is a data-poisoning bug, not semantics; our
buffer writes slot 0, and content assertions exclude it.
"""

from __future__ import annotations

import copy
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.parity  # torch-reference tier (see pytest.ini)

if not os.path.isdir("/root/reference"):  # pragma: no cover
    pytest.skip("reference repo not available", allow_module_level=True)

sys.path.insert(0, os.path.dirname(__file__))
from reference_shim import (
    load_reference_buffer,
    load_reference_loss,
    load_reference_networks,
)

import jax
import jax.numpy as jnp

from bacs_tpu.train import buffer as B

# ---------------------------------------------------------------------------
# shared uniform stream plumbing
# ---------------------------------------------------------------------------


def _u(rs: np.random.RandomState, n: int) -> np.ndarray:
    """Uniforms exactly representable in f32 and never on a floor boundary."""
    return (rs.randint(0, 2**20, size=n) + 0.5) / 2**20


class _Tap:
    """Positional uniform stream for the reference side."""

    def __init__(self, u_res, u_evict):
        self.u_res = np.asarray(u_res, np.float64)
        self.u_evict = np.asarray(u_evict, np.float64)
        self.i = -1  # advanced once per functionalReservoir call (= per item)


def _tap_reference_rng(monkeypatch, refbuf, tap: _Tap):
    """Route the reference Buffer's np.random draws through `tap` without
    touching its logic: functionalReservoir runs unmodified, its
    np.random.randint / np.random.choice(p=…) calls read tap.u_* through the
    exact transformations numpy itself applies (floor(u·N); inverse CDF)."""
    orig = refbuf.Buffer.functionalReservoir

    def counted(self, N, m):
        tap.i += 1
        return orig(self, N, m)

    monkeypatch.setattr(refbuf.Buffer, "functionalReservoir", counted)

    def fake_randint(lo, hi=None, **kw):
        if hi is None:
            lo, hi = 0, lo
        return int(lo + np.floor(tap.u_res[tap.i] * (hi - lo)))

    def fake_choice(a, size=None, replace=True, p=None):
        assert p is not None, "only the p-weighted eviction draw is tapped"
        cdf = np.cumsum(np.asarray(p, np.float64))
        cdf = cdf / cdf[-1]
        idx = min(int(np.searchsorted(cdf, tap.u_evict[tap.i], side="right")),
                  len(cdf) - 1)
        return np.array([idx])

    monkeypatch.setattr(np.random, "randint", fake_randint)
    monkeypatch.setattr(np.random, "choice", fake_choice)


def _ref_counts_vector(ref_buffer, num_classes: int) -> np.ndarray:
    """reference `labels` dict → our class_counts layout ([C] + ignore col)."""
    v = np.zeros(num_classes + 1, np.int32)
    for lbl, cnt in ref_buffer.labels.items():
        col = num_classes if lbl == 255 else int(lbl)
        v[col] = cnt
    v[0] = 0
    return v


# ---------------------------------------------------------------------------
# 1. reservoir / eviction parity on a long stream
# ---------------------------------------------------------------------------


def test_reference_buffer_reservoir_parity(monkeypatch, tmp_path):
    refbuf = load_reference_buffer()
    monkeypatch.chdir(tmp_path)  # DatasetMap memmaps under cwd/mem_maps

    M, C, HW, LHW, BS, NB = 6, 5, 8, 2, 2, 12
    rs = np.random.RandomState(1234)
    u_res = _u(rs, NB * BS)
    u_evict = _u(rs, NB * BS)
    tap = _Tap(u_res, u_evict)
    _tap_reference_rng(monkeypatch, refbuf, tap)

    ref = refbuf.Buffer(M, "parity")
    ref.update_task(task_num=0, new_class_size=C)
    ours = B.init_buffer(M, (HW, HW), (LHW, LHW), C,
                         image_dtype=jnp.float32, logit_dtype=jnp.float32)

    for b in range(NB):
        imgs = rs.rand(BS, HW, HW, 3).astype(np.float32)
        logits = rs.rand(BS, LHW, LHW, C).astype(np.float32)
        labels = rs.randint(0, C, (BS, HW, HW)).astype(np.int64)
        labels[rs.rand(BS, HW, HW) < 0.05] = 255
        labels[:, 0, 0] = 1 + (b % (C - 1))  # ≥1 non-bg label per batch
        # exact-in-f32-and-f64 importance values
        losses = -(rs.randint(1, 200, BS) / 256.0).astype(np.float32)

        ref.add_data({
            "examples": torch.from_numpy(np.transpose(imgs, (0, 3, 1, 2))),
            "logits": torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))),
            "labels": torch.from_numpy(labels),
            "loss": torch.from_numpy(losses),
        })
        sl = slice(b * BS, (b + 1) * BS)
        ours = B.add_batch(
            ours, jax.random.PRNGKey(0),
            jnp.asarray(imgs), jnp.asarray(logits),
            jnp.asarray(labels.astype(np.int32)), jnp.asarray(losses),
            task_id=0, n_classes=C,
            uniforms=(jnp.asarray(u_res[sl], jnp.float32),
                      jnp.asarray(u_evict[sl], jnp.float32)),
        )

        # --- metadata parity after every batch ---
        valid = np.asarray(ours.valid)
        np.testing.assert_array_equal(valid, ref._existing_indices)
        imp = np.asarray(ours.importance)
        np.testing.assert_allclose(
            imp[valid], ref.importance_score[valid], rtol=1e-6)
        assert np.all(np.isneginf(imp[~valid]))
        np.testing.assert_array_equal(
            np.asarray(ours.class_counts), _ref_counts_vector(ref, C))
        np.testing.assert_array_equal(
            np.asarray(ours.n_classes)[valid],
            ref._logits_n_classes[valid])
        assert int(ours.num_seen) == ref.num_seen_examples

        # --- stored content parity (slots ≥ 1; slot-0 divergence below) ---
        for i in np.where(valid)[0]:
            if i == 0:
                continue
            np.testing.assert_allclose(
                np.asarray(ours.images[i]),
                np.transpose(ref.dataset_map["examples"][i], (1, 2, 0)),
                rtol=1e-6)
            np.testing.assert_allclose(
                np.asarray(ours.logits[i]),
                np.transpose(ref.dataset_map["logits"][i], (1, 2, 0)),
                rtol=1e-6)
            np.testing.assert_array_equal(
                np.asarray(ours.labels[i]), ref.dataset_map["labels"][i])

    assert ref.num_seen_examples == NB * BS > M  # evictions actually happened

    # eviction-score parity once full (the distribution the next add uses)
    ref.merge_scores()
    np.testing.assert_allclose(  # f32 (device) vs f64 (numpy) rounding only
        np.asarray(B._eviction_scores(ours)), ref.scores, atol=2e-5)

    # the documented reference bug: slot 0 metadata is live but its stored
    # content was never written (DatasetMap.extend skips index 0)
    assert ref._existing_indices[0]
    np.testing.assert_array_equal(ref.dataset_map["examples"][0], 0.0)
    assert np.any(np.asarray(ours.images[0]) != 0.0)  # ours writes it


# ---------------------------------------------------------------------------
# 2+3. full t → t+1 transition: the reference's real on_train_end + head
# surgery + first replay-live step vs ours
# ---------------------------------------------------------------------------

C0, NEW, TOTAL = 5, 2, 7  # 4+1 initial classes, +2 at task 1
CROP = 64
POP_B, POP_NB = 2, 3  # population stream: 3 batches of 2 (< buffer size 8)
BUF_M = 8


def _randomize_norms(model):
    with torch.no_grad():
        for m in model.modules():
            if hasattr(m, "running_mean") and m.running_mean is not None:
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
                if getattr(m, "weight", None) is not None:
                    m.weight.uniform_(0.5, 1.5)
                    m.bias.normal_(0, 0.05)


class _PopDataset(torch.utils.data.Dataset):
    """Minimal dataset with the attrs on_train_end reads (_x/_y/target_trsf,
    reference bacs_loss.py:163-166)."""

    def __init__(self, xs, ys):
        self.xs, self.ys = xs, ys
        n = xs.shape[0]
        self._x = np.array([f"img_{i}.png" for i in range(n)])
        self._y = np.array([f"lab_{i}.png" for i in range(n)])
        self.target_trsf = None

    def __len__(self):
        return self.xs.shape[0]

    def __getitem__(self, i):
        return (
            torch.from_numpy(np.transpose(self.xs[i], (2, 0, 1))),
            torch.from_numpy(self.ys[i]),
        )


@pytest.fixture(scope="module")
def boundary_pair(tmp_path_factory):
    """Run the full boundary on BOTH sides: task-0 models with identical
    weights → the reference's real `on_train_end` (train-mode population,
    prev clone, buffer fill) vs our `method.end_task`.  No detector and
    buffer > stream so the transition is deterministic (eviction parity is
    test 1's job)."""
    from types import SimpleNamespace

    from bacs_tpu.methods import create_method
    from bacs_tpu.methods.base import ModelContext
    from bacs_tpu.models import create_network
    from bacs_tpu.train.state import TaskInfo, TrainState
    from bacs_tpu.utils.torch_weights import convert_reference_deeplab

    networks = load_reference_networks()
    L = load_reference_loss()
    load_reference_buffer()  # np.Inf shim
    tnn = torch.nn

    cwd = os.getcwd()
    os.chdir(tmp_path_factory.mktemp("memmaps"))  # DatasetMap target
    try:
        torch.manual_seed(3)
        ref = networks.DeepLabV3(norm="abn", pretrained_backbone=False)
        ref.classifier_head = tnn.ModuleList([ref.get_classification_head(C0)])
        _randomize_norms(ref)

        net = create_network(
            "deeplab", num_classes=TOTAL, n_tasks=2, norm="abn", axis_name=None
        )
        x0 = np.random.RandomState(11).rand(2, CROP, CROP, 3).astype(np.float32)
        variables = net.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(x0), train=False,
        )

        def convert(model):
            sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
            params, stats, loaded = convert_reference_deeplab(
                sd, jax.tree.map(lambda a: a, variables)
            )
            expected = len(
                [k for k in sd if not k.endswith("num_batches_tracked")]
            )
            assert loaded == expected, f"only {loaded}/{expected} converted"
            return params, stats

        params, stats = convert(ref)

        # ---- population stream ----
        rs = np.random.RandomState(21)
        xs = rs.rand(POP_NB * POP_B, CROP, CROP, 3).astype(np.float32)
        ys = rs.randint(0, C0, (POP_NB * POP_B, CROP, CROP)).astype(np.int64)
        ys[rs.rand(*ys.shape) < 0.05] = 255

        # ---- reference side: the REAL on_train_end ----
        bacs = L.BACSLoss(
            alpha=0.8, beta=0.2, bg_weighted_ce=False, lkd=0.0,
            buffer_size=BUF_M,
        )
        bacs.nb_current_classes = C0
        bacs.nb_new_classes = C0
        bacs.old_classes = 0
        bacs.initial_classes = C0
        bacs.increment = NEW
        bacs.device = torch.device("cpu")
        bacs.epoch_number = 0
        bacs.max_epochs = 30

        ref_t = copy.deepcopy(ref)
        ref_t.train()  # PL teardown leaves the module in train mode
        dl = torch.utils.data.DataLoader(
            _PopDataset(xs, ys), batch_size=POP_B, shuffle=False
        )
        dl.shuffle = False
        acc = SimpleNamespace(
            root_device=torch.device("cpu"),
            to_device=lambda b: b,
            process_dataloader=lambda d: d,
        )
        tr = SimpleNamespace(
            datamodule=SimpleNamespace(_sweep=False, debug=False)
        )
        with torch.no_grad():
            bacs.on_train_end(
                pre_last_tasks=True, model=ref_t, train_dataloader=dl,
                accelerator=acc, trainer=tr,
            )

        # ---- our side: method.end_task on the same stream ----
        method = create_method(
            "loss.BACSLoss", alpha=0.8, beta=0.2, bg_weighted_ce=False,
            lkd=0.0, buffer_size=BUF_M, use_bg_detector=False,
            buffer_dtype="float32",
        )
        task0 = TaskInfo(
            task_id=0, initial_classes=C0, increment=NEW, num_classes=TOTAL,
            n_tasks=2, max_epochs=30,
        )
        ctx0 = ModelContext(model=net, task=task0, axis_name=None)
        out_probe = net.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(xs[:1]), train=False,
        )
        sem_hw = tuple(out_probe.sem_logits.shape[1:3])
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=stats,
            opt_state=None,
            rng=jax.random.PRNGKey(7),
            prototypes=jnp.zeros((2, out_probe.penultimate.shape[-1])),
            proto_counts=jnp.zeros((2,)),
            buffer=method.init_buffer(task0, (CROP, CROP), sem_hw),
        )
        data = [
            {
                "image": jnp.asarray(xs[b * POP_B : (b + 1) * POP_B]),
                "label": jnp.asarray(
                    ys[b * POP_B : (b + 1) * POP_B].astype(np.int32)
                ),
            }
            for b in range(POP_NB)
        ]
        # end_task's jitted populate passes DONATE state (the buffer
        # scatter is in-place in production) — hand it a copy so the
        # pre-boundary arrays kept in this namespace stay alive
        state_after = method.end_task(
            jax.tree.map(jnp.copy, state), ctx0, data
        )

        return SimpleNamespace(
            networks=networks, L=L, ref=ref, ref_t=ref_t, bacs=bacs,
            net=net, variables=variables, convert=convert,
            params=params, stats=stats, state=state, state_after=state_after,
            method=method, ctx0=ctx0, task0=task0, xs=xs, ys=ys,
            sem_hw=sem_hw,
        )
    finally:
        os.chdir(cwd)


def _leaf_paths(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {jax.tree_util.keystr(p): np.asarray(v) for p, v in flat}


def test_on_train_end_population_parity(boundary_pair):
    """Stored buffer contents, prev-model snapshot, and train-mode BN
    running-stat drift all match the reference's real on_train_end
    (bacs_loss.py:133-203)."""
    bp = boundary_pair
    ours = bp.state_after.buffer
    ref_buf = bp.bacs._get_current_buffer()

    n = POP_NB * POP_B
    assert ref_buf.num_seen_examples == n
    assert int(ours.num_seen) == n
    valid = np.asarray(ours.valid)
    np.testing.assert_array_equal(valid, ref_buf._existing_indices)

    for i in range(1, n):  # slot 0: documented reference content bug
        np.testing.assert_allclose(
            np.asarray(ours.images[i], np.float32),
            np.transpose(ref_buf.dataset_map["examples"][i], (1, 2, 0)),
            atol=1e-6,  # f32 storage in this fixture (buffer_dtype config)
        )
        np.testing.assert_array_equal(
            np.asarray(ours.labels[i]), ref_buf.dataset_map["labels"][i]
        )
        ref_lg = np.transpose(ref_buf.dataset_map["logits"][i], (1, 2, 0))
        our_lg = np.asarray(ours.logits[i, ..., :C0], np.float32)
        # train-mode forward at CROP=64 is ill-conditioned in the deep
        # layers (see test_reference_parity.py) — mean-relative comparison
        denom = np.mean(np.abs(ref_lg)) + 1e-6
        assert np.mean(np.abs(our_lg - ref_lg)) / denom < 5e-2
        # our padding beyond the live classes is zero, like the reference's
        # change_data_size-grown memmap (buffer.py:63-93)
        np.testing.assert_array_equal(
            np.asarray(ours.logits[i, ..., C0:], np.float32), 0.0
        )
    np.testing.assert_array_equal(
        np.asarray(ours.n_classes)[valid], ref_buf._logits_n_classes[valid]
    )
    # importance = −weighted CE per stored image
    imp_ref = ref_buf.importance_score[valid]
    imp_ours = np.asarray(ours.importance)[valid]
    np.testing.assert_allclose(imp_ours, imp_ref, rtol=5e-2)
    assert np.all(imp_ours < 0)

    # prev snapshot taken BEFORE population on both sides
    prev_ours = _leaf_paths(bp.state_after.prev_params)
    orig = _leaf_paths(bp.params)
    for k, v in orig.items():
        np.testing.assert_array_equal(prev_ours[k], v)
    p_prev, s_prev = bp.convert(bp.bacs.prev_model)
    prev_stats_ours = _leaf_paths(bp.state_after.prev_batch_stats)
    for k, v in _leaf_paths(s_prev).items():
        np.testing.assert_allclose(prev_stats_ours[k], v, atol=1e-6)

    # live-model BN running stats DRIFTED identically during population
    _, s_post = bp.convert(bp.ref_t)
    post_ours = _leaf_paths(bp.state_after.batch_stats)
    before_all = _leaf_paths(bp.stats)
    post_ref = _leaf_paths(s_post)
    drifted = moved = 0
    for k, v in post_ref.items():
        if not np.allclose(v, before_all[k]):
            moved += 1
        scale = np.mean(np.abs(v)) + 1e-3
        if np.mean(np.abs(post_ours[k] - v)) / scale < 5e-2:
            drifted += 1
    assert moved > 50  # population really ran train-mode on the ref side
    assert drifted == len(post_ref)  # ours tracked every tensor


def test_post_boundary_step_parity(boundary_pair, monkeypatch):
    """Head surgery (the reference's REAL MultiHeadLearner._initialize_head)
    + one SGD step at task 1 with α/β replay live on matched replay slots:
    losses and head updates must match."""
    from types import SimpleNamespace

    import optax

    from bacs_tpu.methods import create_method
    from bacs_tpu.methods.base import ModelContext
    from bacs_tpu.train.learner import multihead_init
    from bacs_tpu.train.state import TaskInfo

    from reference_shim import load_reference_learner

    bp = boundary_pair
    ref_learner = load_reference_learner()

    # ---- reference side surgery (real code, unbound call: the method does
    # not touch self) ----
    ref_t = bp.ref_t  # carries the post-population BN stats
    new_head = ref_t.get_classification_head(NEW)
    ref_learner.MultiHeadLearner._initialize_head(
        None, ref_t.classifier_head[0], new_head, NEW
    )
    ref_t.classifier_head.append(new_head)

    bacs = bp.bacs
    bacs.old_classes = C0
    bacs.nb_current_classes = TOTAL
    bacs.nb_new_classes = NEW
    bacs._use_der_loss = True
    bacs._init_dark_criterion(torch.device("cpu"))
    bacs.logit_transforms = lambda t: t  # determinism: no autocontrast
    # widen the stored logits to 7 classes with the reference's real memmap
    # surgery (buffer.py:63-93 change_data_size via update_task; the
    # DatasetMap paths are absolute, no chdir needed)
    bacs._init_buffer(task_num=1)
    ref_buf = bacs._get_current_buffer()
    assert ref_buf.dataset_map["logits"].data_size[0] == TOTAL

    # ---- our side surgery ----
    task1 = TaskInfo(
        task_id=1, initial_classes=C0, increment=NEW, num_classes=TOTAL,
        n_tasks=2, max_epochs=30,
    )
    ctx1 = ModelContext(model=bp.net, task=task1, axis_name=None)
    state1 = multihead_init(bp.state_after, task1)

    # imprinting parity: new rows + biases exactly equal
    ref_head0 = ref_t.classifier_head[0]
    ref_head1 = ref_t.classifier_head[1]
    our_head = state1.params["classifier_head"]
    np.testing.assert_allclose(
        np.asarray(our_head["kernel"])[0, 0, :, C0:TOTAL],
        ref_head1.weight.detach().numpy()[:, :, 0, 0].T,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(our_head["bias"])[C0:TOTAL],
        ref_head1.bias.detach().numpy(), atol=1e-6,
    )
    np.testing.assert_allclose(  # bg bias was rewritten too (ref :36)
        np.asarray(our_head["bias"])[0],
        ref_head0.bias.detach().numpy()[0], atol=1e-6,
    )

    # ---- matched replay batches from the two populated buffers ----
    # slot 0 excluded (reference content bug, see module docstring).  With
    # both α items sharing n_classes=5, the reference's transplant-loop
    # indexing quirk (bacs_loss.py:418-427, `returned_indices[indx]`)
    # transplants the grown channels into item 0 ONLY — our default
    # transplant_mode="reference" mirrors this exactly (methods/bacs.py).
    idx_dl, idx_pp = [2, 4], [3, 5]
    ex = ref_buf.dataset_map["examples"]
    lg = ref_buf.dataset_map["logits"]
    lb = ref_buf.dataset_map["labels"]
    t_imgs_dl = torch.from_numpy(np.array([ex[i] for i in idx_dl]))
    t_logits_dl = torch.from_numpy(np.array([lg[i] for i in idx_dl]))
    t_nc = torch.from_numpy(ref_buf._logits_n_classes[idx_dl].astype(np.int64))
    t_imgs_pp = torch.from_numpy(np.array([ex[i] for i in idx_pp]))
    t_labs_pp = torch.from_numpy(np.array([lb[i] for i in idx_pp]).astype(np.int64))

    rs = np.random.RandomState(41)
    x1 = rs.rand(2, CROP, CROP, 3).astype(np.float32)
    y1 = rs.randint(0, TOTAL, (2, CROP, CROP)).astype(np.int64)
    y1[rs.rand(*y1.shape) < 0.05] = 255

    lr = 0.01
    opt = torch.optim.SGD(ref_t.parameters(), lr=lr)
    opt.zero_grad()
    loss_t, _ = bacs.compute_loss(
        {
            "main": (torch.from_numpy(np.transpose(x1, (0, 3, 1, 2))),
                     torch.from_numpy(y1)),
            "buffer": (t_imgs_pp, t_labs_pp),
            "bufferlogits": (t_imgs_dl, t_logits_dl, t_nc),
        },
        ref_t, train=True,
    )
    loss_t.backward()
    head0_before = ref_t.classifier_head[0].weight.detach().clone()
    head1_before = ref_t.classifier_head[1].weight.detach().clone()
    opt.step()
    head_delta_t = np.concatenate([
        (ref_t.classifier_head[0].weight.detach() - head0_before).numpy(),
        (ref_t.classifier_head[1].weight.detach() - head1_before).numpy(),
    ])[:, :, 0, 0]  # [TOTAL, D]

    # ---- our side: same replay slots, same step ----
    import bacs_tpu.data.transforms as transforms_mod
    import bacs_tpu.methods.bacs as bacs_mod

    buf = state1.buffer

    def mem_at(idx):
        i = jnp.asarray(idx)
        return {
            "images": buf.images[i].astype(jnp.float32),
            "logits": buf.logits[i].astype(jnp.float32),
            "labels": buf.labels[i],
            "n_classes": buf.n_classes[i],
            "indices": i,
        }

    queue = [mem_at(idx_dl), mem_at(idx_pp)]  # α (_dark_logits) samples first
    monkeypatch.setattr(
        bacs_mod.buffer_lib, "sample",
        lambda b, rng, n, task_id=None: queue.pop(0),
    )
    monkeypatch.setattr(
        bacs_mod, "random_autocontrast", lambda rng, im, p=0.5: im
    )
    monkeypatch.setattr(
        transforms_mod, "replay_augment", lambda rng, im, lab: (im, lab)
    )

    method1 = create_method(
        "loss.BACSLoss", alpha=0.8, beta=0.2, bg_weighted_ce=False,
        lkd=0.0, buffer_size=BUF_M, use_bg_detector=False,
        buffer_dtype="float32",
    )
    batch = {
        "image": jnp.asarray(x1),
        "label": jnp.asarray(y1.astype(np.int32)),
    }

    def loss_fn(p):
        loss, aux = method1.compute_loss(
            ctx1, p, state1, batch, True, jax.random.PRNGKey(0)
        )
        return loss, aux

    (loss_j, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state1.params
    )
    tx = optax.sgd(lr)
    updates, _ = tx.update(grads, tx.init(state1.params), state1.params)
    new_params = optax.apply_updates(state1.params, updates)

    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()), rtol=5e-2)
    head_delta_j = np.asarray(
        new_params["classifier_head"]["kernel"]
        - state1.params["classifier_head"]["kernel"]
    )[0, 0].T  # [C, D]
    denom = np.mean(np.abs(head_delta_t)) + 1e-12
    assert np.mean(np.abs(head_delta_j - head_delta_t)) / denom < 5e-2


def test_detector_double_drift_stats_parity(tmp_path):
    """Buffer population with the bg-detector ON: the reference runs TWO
    train-mode passes over the penultimate path per batch — the full
    forward (bacs_loss.py:182) and the `_get_seen_detector` probe
    (bacs_loss.py:191 → get_penultimate_output, deeplab_v3.py:116-118,
    which also runs the detector trunk's BatchNorm,
    bg_detector.py:57-62).  Backbone AND trunk running stats drift twice
    per batch; head/ASPP stats once.  Our `end_task` mirrors this via
    `penultimate_stats_keys` — this is the only test where that mirror
    actually executes against the reference (the detector-less fixture
    above never reaches the probe)."""
    from types import SimpleNamespace

    from bacs_tpu.methods import create_method
    from bacs_tpu.methods.base import ModelContext
    from bacs_tpu.models import create_network
    from bacs_tpu.train.state import TaskInfo, TrainState
    from bacs_tpu.utils.torch_weights import convert_reference_deeplab

    networks = load_reference_networks()
    L = load_reference_loss()
    load_reference_buffer()  # np.Inf shim
    tnn = torch.nn

    cwd = os.getcwd()
    os.chdir(tmp_path)  # DatasetMap memmap target
    try:
        torch.manual_seed(5)
        ref = networks.DeepLabV3(norm="abn", pretrained_backbone=False)
        ref.classifier_head = tnn.ModuleList(
            [ref.get_classification_head(C0)]
        )
        ref.seen_fg_network = ref.get_seen_not_seen_head()
        ref.seen_fg_network.seen_not_seen_clf = tnn.ModuleList(
            [ref.seen_fg_network.get_classification_head(1) for _ in range(2)]
        )
        _randomize_norms(ref)

        net = create_network(
            "deeplab", num_classes=TOTAL, n_tasks=2, use_bg_detector=True,
            norm="abn", axis_name=None,
        )
        x0 = np.random.RandomState(13).rand(2, CROP, CROP, 3).astype(
            np.float32
        )
        variables = net.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            jnp.asarray(x0), train=False,
        )
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        params, stats, loaded = convert_reference_deeplab(sd, variables)
        expected = len(
            [k for k in sd if not k.endswith("num_batches_tracked")]
        )
        assert loaded == expected, f"only {loaded}/{expected} converted"

        rs = np.random.RandomState(29)
        xs = rs.rand(POP_NB * POP_B, CROP, CROP, 3).astype(np.float32)
        ys = rs.randint(0, C0, (POP_NB * POP_B, CROP, CROP)).astype(np.int64)

        # ---- reference: REAL on_train_end with the detector probe live ----
        bacs = L.BACSLoss(
            alpha=0.8, beta=0.2, bg_weighted_ce=False, lkd=0.0,
            buffer_size=BUF_M,
        )
        bacs.nb_current_classes = C0
        bacs.nb_new_classes = C0
        bacs.old_classes = 0
        bacs.initial_classes = C0
        bacs.increment = NEW
        bacs.device = torch.device("cpu")
        bacs.epoch_number = 0
        bacs.max_epochs = 30
        pen_dim = 512  # 2048 // 4 detector trunk width
        torch.manual_seed(17)
        bacs._prototypes = SimpleNamespace(
            _prototypes_tensors=[torch.randn(pen_dim) for _ in range(2)],
            on_train_end=lambda **kw: None,
        )

        ref_t = copy.deepcopy(ref)
        ref_t.train()
        dl = torch.utils.data.DataLoader(
            _PopDataset(xs, ys), batch_size=POP_B, shuffle=False
        )
        dl.shuffle = False
        acc = SimpleNamespace(
            root_device=torch.device("cpu"),
            to_device=lambda b: b,
            process_dataloader=lambda d: d,
        )
        tr = SimpleNamespace(
            datamodule=SimpleNamespace(_sweep=False, debug=False)
        )
        with torch.no_grad():
            bacs.on_train_end(
                pre_last_tasks=True, model=ref_t, train_dataloader=dl,
                accelerator=acc, trainer=tr,
            )

        # ---- ours: end_task with use_bg_detector=True ----
        method = create_method(
            "loss.BACSLoss", alpha=0.8, beta=0.2, bg_weighted_ce=False,
            lkd=0.0, buffer_size=BUF_M, use_bg_detector=True,
            buffer_dtype="float32",
        )
        task0 = TaskInfo(
            task_id=0, initial_classes=C0, increment=NEW, num_classes=TOTAL,
            n_tasks=2, max_epochs=30,
        )
        ctx0 = ModelContext(model=net, task=task0, axis_name=None)
        out_probe = net.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(xs[:1]), train=False,
        )
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=stats,
            opt_state=None,
            rng=jax.random.PRNGKey(7),
            prototypes=jnp.zeros((2, out_probe.penultimate.shape[-1])),
            proto_counts=jnp.zeros((2,)),
            buffer=method.init_buffer(
                task0, (CROP, CROP), tuple(out_probe.sem_logits.shape[1:3])
            ),
        )
        data = [
            {
                "image": jnp.asarray(xs[b * POP_B : (b + 1) * POP_B]),
                "label": jnp.asarray(
                    ys[b * POP_B : (b + 1) * POP_B].astype(np.int32)
                ),
            }
            for b in range(POP_NB)
        ]
        # copy: end_task donates its state (see boundary_pair fixture)
        state_after = method.end_task(
            jax.tree.map(jnp.copy, state), ctx0, data
        )

        # ---- drifted stats trees must match, trunk included ----
        _, s_post = convert_reference_deeplab(
            {k: v.detach().numpy() for k, v in ref_t.state_dict().items()},
            variables,
        )[0:2]
        post_ref = _leaf_paths(s_post)
        post_ours = _leaf_paths(state_after.batch_stats)
        before_all = _leaf_paths(stats)
        # the probe really drifted the detector trunk on the ref side
        trunk_moved = [
            k for k, v in post_ref.items()
            if "seen_fg_network" in k and not np.allclose(v, before_all[k])
        ]
        assert trunk_moved, "reference probe did not touch the trunk BN"
        mismatched = []
        for k, v in post_ref.items():
            scale = np.mean(np.abs(v)) + 1e-3
            if np.mean(np.abs(post_ours[k] - v)) / scale >= 5e-2:
                mismatched.append(k)
        assert not mismatched, f"stats diverged after population: {mismatched}"
    finally:
        os.chdir(cwd)
