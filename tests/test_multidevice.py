"""Multi-device DP tests on a virtual 8-device CPU mesh (SURVEY.md §4).

The reference never tested its DDP path without hardware; here the
shard_map'ped train step runs on 8 fake devices and must match the
single-device step bitwise-ish (sync-BN statistics make them equivalent).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from bacs_tpu.methods import CrossEntropyMethod
from bacs_tpu.methods.base import ModelContext
from bacs_tpu.models import create_network
from bacs_tpu.train.optim import make_optimizer, poly_schedule
from bacs_tpu.train.state import TaskInfo, TrainState
from bacs_tpu.train.step import make_steps


def _setup(axis_name, n_classes=4):
    net = create_network(
        "unet", num_classes=n_classes, axis_name=axis_name, crop_size=16,
        num_layers=3,
    )
    x = jnp.zeros((8, 16, 16, 3))
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=True,
    )
    task = TaskInfo(task_id=0, initial_classes=n_classes, increment=0,
                    num_classes=n_classes, n_tasks=1, max_epochs=1)
    tx = make_optimizer(
        {"_target_": "torch.optim.SGD", "lr": 0.1, "momentum": 0.9},
        poly_schedule(0.1, 10),
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        rng=jax.random.PRNGKey(7),
        prototypes=jnp.zeros((1, 128)),
        proto_counts=jnp.zeros((1,)),
    )
    return net, task, tx, state


def _batch():
    rng = np.random.RandomState(0)
    return {
        "image": jnp.asarray(rng.rand(8, 16, 16, 3).astype(np.float32)),
        "label": jnp.asarray(rng.randint(0, 4, (8, 16, 16)).astype(np.int32)),
    }


def test_eight_device_step_matches_single_device():
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    batch = _batch()
    method = CrossEntropyMethod()

    net1, task, tx1, state1 = _setup(axis_name=None)
    train1, eval1, put1 = make_steps(
        ModelContext(net1, task, None), method, tx1, 4, mesh=None
    )
    state1, metrics1 = train1(state1, batch)

    mesh = Mesh(np.array(devices[:8]), ("data",))
    net8, task, tx8, state8 = _setup(axis_name="data")
    train8, eval8, put8 = make_steps(
        ModelContext(net8, task, "data"), method, tx8, 4, mesh=mesh
    )
    state8, metrics8 = train8(state8, put8(batch))

    # sync-BN + pmean grads ⇒ same loss and same updated params
    np.testing.assert_allclose(
        float(metrics1["loss"]), float(metrics8["loss"]), rtol=1e-5
    )
    l1 = jax.tree.leaves(state1.params)
    l8 = jax.tree.leaves(state8.params)
    for a, b in zip(l1, l8):
        # shard-wise gradient reduction reorders float accumulation; allow
        # epsilon-level drift
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4
        )

    # eval parity: confusion matrices identical
    cm1 = jnp.zeros((4, 4), jnp.int32)
    cm1, _ = eval1(state1, cm1, batch)
    cm8 = jnp.zeros((4, 4), jnp.int32)
    cm8, _ = eval8(state8, cm8, put8(batch))
    np.testing.assert_array_equal(np.asarray(cm1), np.asarray(cm8))


def test_sync_abn_stats_are_cross_replica():
    """ABN with axis_name must produce identical batch stats on all shards
    (the iabn_sync replacement, reference deeplab_v3.py:77-80)."""
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    from bacs_tpu.models.norm import ABN

    mesh = Mesh(np.array(devices[:8]), ("data",))
    abn = ABN(features=4, axis_name="data")
    x = jnp.asarray(np.random.RandomState(0).rand(16, 4, 4, 4), jnp.float32)
    variables = abn.init(jax.random.PRNGKey(0), x[:2])

    def fwd(v, xs):
        y, mut = abn.apply(v, xs, use_running_average=False,
                           mutable=["batch_stats"])
        return y, mut["batch_stats"]

    from jax.sharding import PartitionSpec as P

    y, stats = jax.jit(
        jax.shard_map(
            fwd, mesh=mesh, in_specs=(P(), P("data")), out_specs=(P("data"), P()),
            check_vma=False,
        )
    )(variables, x)
    # global-batch statistics == computing on the full batch at once
    mean_global = np.mean(np.asarray(x), axis=(0, 1, 2))
    np.testing.assert_allclose(
        np.asarray(stats["mean"]) / 0.1, mean_global, rtol=1e-5
    )  # momentum 0.1 from zero-init running mean


def test_atrous_encoder_sync_bn_on_mesh():
    """SDR atrous encoder: 6 attention maps (5 backbone + ASPP) and
    synchronized BN stats across the 8-device mesh (the reference hard-wires
    SynchronizedBatchNorm2d momentum 3e-4, networks/resnet_atrous.py:31)."""
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    from jax.sharding import PartitionSpec as P

    mesh = Mesh(np.array(devices[:8]), ("data",))
    net = create_network(
        "deeplab", num_classes=4, axis_name="data", atrous_encoder=True,
        backbone="resnet50", crop_size=32,
    )
    x = jnp.asarray(np.random.RandomState(0).rand(8, 32, 32, 3), jnp.float32)
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x[:1], train=False,
    )

    def fwd(v, xs):
        out, mut = net.apply(
            v, xs, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
        return len(out.attentions), mut["batch_stats"]

    n_atts, stats = jax.jit(
        jax.shard_map(
            fwd, mesh=mesh, in_specs=(P(), P("data")),
            out_specs=(P(), P()), check_vma=False,
        )
    )(variables, x)
    assert int(n_atts) == 6
    # synced stats: stem bn mean must equal the full-batch statistic
    # folded with momentum 3e-4 from zero init
    stem = stats["backbone"]["bn1"]
    assert np.asarray(stem["mean"]).shape == (64,)
    assert np.abs(np.asarray(stem["mean"])).max() > 0  # was updated
    # the update must reflect GLOBAL (all-shard) statistics: recompute on one
    # shard only (axis-free twin, same params) and verify it differs
    net_local = create_network(
        "deeplab", num_classes=4, axis_name=None, atrous_encoder=True,
        backbone="resnet50", crop_size=32,
    )
    _, stats_local = jax.jit(
        lambda v, xs: net_local.apply(
            v, xs, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )
    )(variables, x[:1])
    local = np.asarray(stats_local["batch_stats"]["backbone"]["bn1"]["mean"])
    assert not np.allclose(local, np.asarray(stem["mean"]))


def test_multi_step_scan_on_mesh():
    """Scanned K-step training under shard_map matches running K single
    steps (same data order)."""
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    from bacs_tpu.train.step import make_multi_step, make_steps

    mesh = Mesh(np.array(devices[:8]), ("data",))
    method = CrossEntropyMethod()
    rng = np.random.RandomState(3)
    K = 3
    batches = {
        "image": jnp.asarray(rng.rand(K, 8, 16, 16, 3).astype(np.float32)),
        "label": jnp.asarray(rng.randint(0, 4, (K, 8, 16, 16)).astype(np.int32)),
    }

    net, task, tx, state_a = _setup(axis_name="data")
    ctx = ModelContext(net, task, "data")
    multi = make_multi_step(ctx, method, tx, mesh=mesh)
    state_a, metrics = multi(state_a, batches)

    _, _, tx_b, state_b = _setup(axis_name="data")
    train1, _, put1 = make_steps(ctx, method, tx_b, 4, mesh=mesh)
    for k in range(K):
        b = {"image": batches["image"][k], "label": batches["label"][k]}
        state_b, m = train1(state_b, put1(b))

    np.testing.assert_allclose(
        float(metrics["loss"]), float(m["loss"]), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_gspmd_spatial_partition_matches_single_device():
    """2-D (data=2, space=4) GSPMD mesh: batch sharded over N, image HEIGHT
    over chips.  XLA inserts the conv halo exchanges and turns the global
    BN means into cross-chip reductions, so the step must match the
    single-device step exactly (same program, partitioned execution)."""
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    from bacs_tpu.parallel.mesh import make_spatial_mesh
    from bacs_tpu.train.step import make_gspmd_steps

    batch = _batch()
    method = CrossEntropyMethod()

    net1, task, tx1, state1 = _setup(axis_name=None)
    train1, eval1, _ = make_steps(
        ModelContext(net1, task, None), method, tx1, 4, mesh=None
    )
    ref_state, ref_metrics = train1(state1, batch)

    mesh = make_spatial_mesh(4, 8)
    assert mesh is not None and mesh.devices.shape == (2, 4)
    netS, task, txS, stateS = _setup(axis_name=None)
    trainS, evalS, putS = make_gspmd_steps(
        ModelContext(netS, task, None, spatial_mesh=mesh), method, txS, 4,
        mesh=mesh,
    )
    stateS, metricsS = trainS(stateS, putS(batch))

    np.testing.assert_allclose(
        float(ref_metrics["loss"]), float(metricsS["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(ref_state.params), jax.tree.leaves(stateS.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4
        )

    cm1 = jnp.zeros((4, 4), jnp.int32)
    cm1, _ = eval1(ref_state, cm1, batch)
    cmS = jnp.zeros((4, 4), jnp.int32)
    cmS, _ = evalS(stateS, cmS, putS(batch))
    np.testing.assert_array_equal(np.asarray(cm1), np.asarray(cmS))


def test_spatial_fused_ce_ops_match_global():
    """The shard_map'ped spatial variants of every fused upsample+CE op
    (halo exchange + shard-local interp windows + psum) must equal the
    global single-program ops exactly — values AND gradients (VERDICT r2
    next #2: kernel × spatial-partition composability)."""
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    from bacs_tpu.ops.confusion import confusion_matrix  # noqa: F401
    from bacs_tpu.ops.upsample_ce import (
        spatial_upsampled_bacs_weighted_ce,
        spatial_upsampled_cross_entropy,
        spatial_upsampled_weighted_cross_entropy,
        upsampled_bacs_weighted_ce,
        upsampled_cross_entropy,
        upsampled_weighted_cross_entropy,
    )
    from bacs_tpu.ops.upsample_confusion import (
        spatial_upsampled_confusion,
        upsampled_confusion,
    )
    from bacs_tpu.parallel.mesh import make_spatial_mesh

    mesh = make_spatial_mesh(4, 8)  # data=2 x space=4
    N, h, w, C = 4, 8, 8, 6
    H, W = 64, 64
    rng = np.random.RandomState(0)
    sem = jnp.asarray(rng.randn(N, h, w, C).astype(np.float32))
    labels = rng.randint(0, C, (N, H, W)).astype(np.int32)
    labels[rng.rand(N, H, W) < 0.05] = 255
    labels = jnp.asarray(labels)
    weights = jnp.asarray(np.array([0, 1, 1, 1, 0.5, 0], np.float32))
    max_seen = jnp.asarray(rng.rand(N, H, W).astype(np.float32))

    cases = [
        (
            lambda s: upsampled_cross_entropy(s, labels, (H, W)),
            lambda s: spatial_upsampled_cross_entropy(s, labels, (H, W), mesh),
        ),
        (
            lambda s: upsampled_weighted_cross_entropy(
                s, labels, weights, (H, W)
            ),
            lambda s: spatial_upsampled_weighted_cross_entropy(
                s, labels, weights, (H, W), mesh
            ),
        ),
        (
            lambda s: upsampled_bacs_weighted_ce(
                s, labels, max_seen, (H, W), old_classes=3
            ),
            lambda s: spatial_upsampled_bacs_weighted_ce(
                s, labels, max_seen, (H, W), mesh, old_classes=3
            ),
        ),
    ]
    for i, (ref_fn, sp_fn) in enumerate(cases):
        ref, g_ref = jax.value_and_grad(ref_fn)(sem)
        sp, g_sp = jax.value_and_grad(sp_fn)(sem)
        np.testing.assert_allclose(float(sp), float(ref), rtol=1e-5,
                                   err_msg=f"case {i} value")
        np.testing.assert_allclose(np.asarray(g_sp), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=f"case {i} grad")

    cm_ref = upsampled_confusion(sem, labels, (H, W), C)
    cm_sp = spatial_upsampled_confusion(sem, labels, (H, W), mesh, C)
    np.testing.assert_array_equal(np.asarray(cm_sp), np.asarray(cm_ref))

    # MiB's fused terms: mean-over-ALL (U)CE and the two-logit unbiased KD
    from bacs_tpu.ops.upsample_ce import (
        spatial_upsampled_mib_ce,
        spatial_upsampled_unbiased_kd,
        upsampled_ce_sums,
        upsampled_uce_sums,
        upsampled_unbiased_kd,
    )

    sem_old = jnp.asarray(rng.randn(N, h, w, 3).astype(np.float32))
    n_tot = N * H * W

    def mib_uce_ref(s):
        return upsampled_uce_sums(s, labels, (H, W), 3, 255, None)[0] / n_tot

    def mib_ce_ref(s):
        return upsampled_ce_sums(s, labels, (H, W), 255, None)[0] / n_tot

    mib_cases = [
        (
            mib_uce_ref,
            lambda s: spatial_upsampled_mib_ce(s, labels, (H, W), mesh, 3),
        ),
        (
            mib_ce_ref,
            lambda s: spatial_upsampled_mib_ce(s, labels, (H, W), mesh, 0),
        ),
        (
            lambda s: upsampled_unbiased_kd(s, sem_old, (H, W)),
            lambda s: spatial_upsampled_unbiased_kd(s, sem_old, (H, W), mesh),
        ),
    ]
    for i, (ref_fn, sp_fn) in enumerate(mib_cases):
        ref, g_ref = jax.value_and_grad(ref_fn)(sem)
        sp, g_sp = jax.value_and_grad(sp_fn)(sem)
        np.testing.assert_allclose(float(sp), float(ref), rtol=1e-5,
                                   err_msg=f"mib case {i} value")
        np.testing.assert_allclose(np.asarray(g_sp), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=f"mib case {i} grad")

    # PLOP's fused pseudo-label CE (teacher pseudo-labels + per-image
    # adaptive factor + mean over ALL pixels)
    from bacs_tpu.ops.upsample_ce import (
        spatial_plop_pseudo_ce,
        upsampled_ce_sums_per_image,
        upsampled_plop_pseudo_labels,
    )

    thr = jnp.asarray(
        np.concatenate([rng.rand(3) * 0.5 + 0.2, np.zeros(C - 3)]
                       ).astype(np.float32)
    )
    me = jnp.float32(np.log(C))

    def plop_ref(s):
        pseudo, num, den = upsampled_plop_pseudo_labels(
            sem_old, labels, thr, (H, W), me
        )
        factor = jnp.clip(num / jnp.maximum(den, 1.0), 0.0, None)
        ls, _ = upsampled_ce_sums_per_image(s, pseudo, (H, W), 255, None)
        return jnp.sum(factor * ls) / n_tot

    ref, g_ref = jax.value_and_grad(plop_ref)(sem)
    sp, g_sp = jax.value_and_grad(
        lambda s: spatial_plop_pseudo_ce(s, sem_old, labels, thr, me, (H, W),
                                         mesh)
    )(sem)
    np.testing.assert_allclose(float(sp), float(ref), rtol=1e-5,
                               err_msg="plop value")
    np.testing.assert_allclose(np.asarray(g_sp), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6, err_msg="plop grad")


def test_trainer_bacs_boundary_on_mesh(tmp_path):
    """Full BACS continual run with a 2-device data mesh: the task-BOUNDARY
    passes (begin_task/end_task buffer population, prototype sweeps) are
    plain per-process jits and must run on an axis-FREE model — a sync-BN
    model with a bound mesh axis would hit an unbound named axis there
    (latent until round 3: only CE, which has no boundary forwards, was
    mesh-tested across boundaries)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    from bacs_tpu.config import load_config
    from bacs_tpu.train.loop import Trainer

    config = load_config(
        "conf/continual_debug", "config",
        [
            "+training.n_devices=2",
            "dataset.dataset.crop_size=32",
            "loss=bacs",
            "training.bg_detector=true",
            "loss.buffer_size=8",
            "loss.replay_minibatch_size=2",
        ],
    )
    trainer = Trainer(config)
    assert trainer.mesh is not None and trainer.n_devices == 2

    # boundary passes (begin_task/end_task) run as plain single-device jits:
    # their streams must be LOADER-sized (n_devices=1), not scaled by the
    # mesh size — a pod-sized batch through one chip's jit would OOM
    calls = []
    orig = trainer.datamodule.train_batches

    def spy(*a, **k):
        calls.append(dict(k))
        return orig(*a, **k)

    trainer.datamodule.train_batches = spy
    miou = trainer.fit()
    boundary = [k for k in calls if "process_shard" not in k]
    step = [k for k in calls if "process_shard" in k]
    assert boundary and all(k.get("n_devices") == 1 for k in boundary)
    assert step and all(k.get("n_devices") == 2 for k in step)

    assert np.isfinite(miou) and 0.0 <= miou <= 1.0
    assert trainer.state.prev_params is not None
    assert int(trainer.state.buffer.num_seen) > 0
