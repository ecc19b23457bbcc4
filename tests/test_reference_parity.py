"""Step-level parity against the ACTUAL reference code at /root/reference.

The strongest substitute for a full VOC run without data: load identical
weights into the reference torch DeepLabV3 (networks/deeplab_v3.py:22-341)
and the Flax model, assert every forward output matches, then assert each
loss term computed by the reference's real loss_utils
(training/loss_utils.py) matches this repo's ops/losses.py on identical
inputs.  Tolerance 1e-3 (f32 CPU round-trip); observed deltas are ~1e-6.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.parity  # torch-reference tier (see pytest.ini)

if not os.path.isdir("/root/reference"):  # pragma: no cover
    pytest.skip("reference repo not available", allow_module_level=True)

sys.path.insert(0, os.path.dirname(__file__))
from reference_shim import load_reference_loss_utils, load_reference_networks

import jax
import jax.numpy as jnp

from bacs_tpu.models import create_network
from bacs_tpu.utils.torch_weights import convert_reference_deeplab

N_CLASSES = 18  # 16 + 1 + 1 (VOC-15-1-style head split, small eval grid)
HEAD_SPLIT = (16, 1, 1)
CROP = 64
TOL = 1e-3


def _to_nhwc(t: "torch.Tensor") -> np.ndarray:
    a = t.detach().numpy()
    return np.transpose(a, (0, 2, 3, 1)) if a.ndim == 4 else a


def _randomize_norms(model: "torch.nn.Module") -> None:
    """Non-trivial norm params/stats (positive scales: ABN stores |scale|)."""
    with torch.no_grad():
        for m in model.modules():
            if hasattr(m, "running_mean") and m.running_mean is not None:
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
                if getattr(m, "weight", None) is not None:
                    m.weight.uniform_(0.5, 1.5)
                    m.bias.normal_(0, 0.05)


@pytest.fixture(scope="module")
def pair():
    """(torch reference model, flax model, flax variables, input) with
    identical weights: multi-head classifier + BgDetector attached."""
    networks = load_reference_networks()
    tnn = torch.nn

    torch.manual_seed(0)
    ref = networks.DeepLabV3(norm="abn", pretrained_backbone=False)
    ref.classifier_head = tnn.ModuleList(
        [ref.get_classification_head(c) for c in HEAD_SPLIT]
    )
    ref.seen_fg_network = ref.get_seen_not_seen_head()
    ref.seen_fg_network.seen_not_seen_clf = tnn.ModuleList(
        [
            ref.seen_fg_network.get_classification_head(1)
            for _ in range(len(HEAD_SPLIT))
        ]
    )
    _randomize_norms(ref)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    net = create_network(
        "deeplab",
        num_classes=N_CLASSES,
        n_tasks=len(HEAD_SPLIT),
        use_bg_detector=True,
        norm="abn",
        axis_name=None,
    )
    x = np.random.RandomState(1).rand(2, CROP, CROP, 3).astype(np.float32)
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x),
        train=False,
    )
    params, batch_stats, loaded = convert_reference_deeplab(sd, variables)
    expected = len([k for k in sd if not k.endswith("num_batches_tracked")])
    assert loaded == expected, f"only {loaded}/{expected} tensors converted"
    return ref, net, {"params": params, "batch_stats": batch_stats}, x


def test_forward_eval_parity(pair):
    """reference: networks/deeplab_v3.py:127-172 full forward contract."""
    ref, net, variables, x = pair
    out = net.apply(variables, jnp.asarray(x), train=False)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    with torch.no_grad():
        logits_t, pen_t, atts_t = ref(
            xt, return_attentions=True, return_penultimate=True
        )
        sem_t = ref(xt, return_sem_logits=True)
    np.testing.assert_allclose(
        np.asarray(out.logits), _to_nhwc(logits_t), atol=TOL, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(out.sem_logits), _to_nhwc(sem_t), atol=TOL, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(out.penultimate), _to_nhwc(pen_t), atol=TOL, rtol=0
    )
    assert len(out.attentions) == len(atts_t) == 5
    for aj, at in zip(out.attentions, atts_t):
        np.testing.assert_allclose(np.asarray(aj), _to_nhwc(at), atol=TOL, rtol=0)


def test_forward_train_parity(pair):
    """Train-mode batch-norm path incl. running-stat updates (unbiased var)."""
    ref, net, variables, x = pair
    import copy

    ref_t = copy.deepcopy(ref)
    ref_t.train()
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    with torch.no_grad():
        logits_t, _, atts_t = ref_t(
            xt, return_attentions=True, return_penultimate=True
        )
    out, mutated = net.apply(
        variables,
        jnp.asarray(x),
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    # Early stages compare tight; deep-layer train-mode BN over 4x4 spatial
    # stats is ill-conditioned — torch itself amplifies a 1e-6 input
    # perturbation to 3.4e-3 at the logits here — so the end-to-end bound is
    # the measured conditioning, not implementation tolerance.
    for aj, at in zip(out.attentions[:2], atts_t[:2]):
        np.testing.assert_allclose(np.asarray(aj), _to_nhwc(at), atol=TOL, rtol=0)
    np.testing.assert_allclose(
        np.asarray(out.logits), _to_nhwc(logits_t), atol=0.05, rtol=0
    )
    # running stats after one train step must match torch's unbiased update
    ref_sd = {k: v.detach().numpy() for k, v in ref_t.state_dict().items()}
    stem = mutated["batch_stats"]["backbone"]["bn1"]
    np.testing.assert_allclose(
        np.asarray(stem["mean"]),
        ref_sd["backbone.mod1.bn1.running_mean"],
        atol=TOL,
        rtol=0,
    )
    np.testing.assert_allclose(
        np.asarray(stem["var"]),
        ref_sd["backbone.mod1.bn1.running_var"],
        atol=TOL,
        rtol=0,
    )


def test_bg_detector_parity(pair):
    """reference: networks/bg_detector.py get_seen_map_task/get_seen_probs."""
    ref, net, variables, x = pair
    n_tasks = len(HEAD_SPLIT)
    pen_dim = 512  # 2048 // 4
    protos = np.random.RandomState(3).randn(n_tasks, pen_dim).astype(np.float32)

    out = net.apply(variables, jnp.asarray(x), train=False)
    pen_j = out.penultimate

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    with torch.no_grad():
        _, pen_t = ref(xt, return_penultimate=True)
        protos_t = torch.from_numpy(protos)
        seen_map_t = ref.seen_fg_network.get_seen_map_task(pen_t, protos_t, 1)
        seen_probs_t = ref.seen_fg_network.get_seen_probs(pen_t, protos_t)

    seen_map_j = net.apply(
        variables,
        pen_j,
        jnp.asarray(protos),
        1,
        False,
        method="seen_map_task",
    )
    seen_probs_j = net.apply(
        variables,
        pen_j,
        jnp.asarray(protos),
        n_tasks,
        method="seen_probs",
    )
    np.testing.assert_allclose(
        np.asarray(seen_map_j), _to_nhwc(seen_map_t), atol=TOL, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(seen_probs_j), _to_nhwc(seen_probs_t), atol=TOL, rtol=0
    )


def test_transeg_forward_parity():
    """TranSeg transformer mask decoder vs the reference's
    (networks/transeg.py:85-175, layers.py:39-95): same backbone features →
    feature embedding + pos embed + class tokens → decoder blocks →
    normalized patch·classᵀ masks → mask LayerNorm."""
    import collections
    import types

    if not hasattr(collections, "Iterable"):  # py>=3.10 moved it
        collections.Iterable = collections.abc.Iterable

    networks = load_reference_networks()
    from bacs_tpu.utils.torch_weights import convert_reference_transeg

    n_cls, crop = 12, 64
    cfg = types.SimpleNamespace(
        hidden_dim=64, dim_feedforward=128, nhead=2, num_decoder_layers=2
    )
    torch.manual_seed(3)
    ref = networks.TranSeg(
        norm="abn", pretrained_backbone=False, crop_size=crop,
        num_classes=n_cls, transformer=cfg,
    )
    _randomize_norms(ref)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    net = create_network(
        "transeg", num_classes=n_cls, norm="abn", axis_name=None,
        crop_size=crop, transformer=vars(cfg),
    )
    x = np.random.RandomState(4).rand(2, crop, crop, 3).astype(np.float32)
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x), train=False,
    )
    params, stats, loaded = convert_reference_transeg(sd, variables)
    expected = len(
        [
            k
            for k in sd
            if not k.endswith("num_batches_tracked")
            and not k.startswith("classifier_head.")  # unused in TranSeg
        ]
    )
    assert loaded == expected, f"only {loaded}/{expected} tensors converted"

    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        logits_t = ref(xt)
        sem_t = ref(xt, return_sem_logits=True)
    out = net.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    np.testing.assert_allclose(
        np.asarray(out.sem_logits), _to_nhwc(sem_t), atol=TOL, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(out.logits), _to_nhwc(logits_t), atol=TOL, rtol=0
    )


@pytest.mark.parametrize("bilinear", [False, True])
def test_unet_forward_parity(bilinear):
    """UNet encoder/decoder vs the reference (networks/unet.py:10-180):
    DoubleConv stacks, maxpool Down, bilinear-or-transposed Up with skip
    concat, 1x1 classifier."""
    networks = load_reference_networks()
    from bacs_tpu.utils.torch_weights import convert_reference_unet

    n_cls, crop, layers = 7, 64, 4
    torch.manual_seed(5)
    ref = networks.UNet(
        n_channels=3, bilinear=bilinear, num_layers=layers,
        pretrained_backbone=False,
    )
    ref.classifier_head = ref.get_classification_head(n_cls)
    _randomize_norms(ref)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    net = create_network(
        "unet", num_classes=n_cls, norm="abn", axis_name=None,
        bilinear=bilinear, num_layers=layers,
    )
    x = np.random.RandomState(6).rand(2, crop, crop, 3).astype(np.float32)
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x), train=False,
    )
    params, stats, loaded = convert_reference_unet(sd, variables)
    expected = len([k for k in sd if not k.endswith("num_batches_tracked")])
    assert loaded == expected, f"only {loaded}/{expected} tensors converted"

    with torch.no_grad():
        logits_t = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    out = net.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    np.testing.assert_allclose(
        np.asarray(out.logits), _to_nhwc(logits_t), atol=TOL, rtol=0
    )


def test_atrous_encoder_parity():
    """SDR ResNet_Atrous DeepLab: 5 backbone attentions, BN+ReLU momentum
    3e-4, last-stage atrous multipliers (reference: networks/resnet_atrous.py,
    deeplab_v3.py:52-57,72-75).  resnet50 keeps the suite fast; the block /
    stage machinery is identical for resnet101."""
    networks = load_reference_networks()
    torch.manual_seed(1)
    ref = networks.DeepLabV3(
        norm="bn", atrous_encoder=True, pretrained_backbone=False
    )
    # reference hard-codes resnet101 for atrous; rebuild the backbone as
    # resnet50 ([3,4,6,3], atrous [1,2,1]) through its own factory for speed
    import importlib

    ra = importlib.import_module("networks.resnet_atrous")
    ref.backbone = ra.ResNet_Atrous(
        ra.Bottleneck, [3, 4, 6, 3], atrous=[1, 2, 1], os=16
    )
    ref.classifier_head = ref.get_classification_head(7)
    _randomize_norms(ref)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    net = create_network(
        "deeplab",
        num_classes=7,
        norm="bn",
        axis_name=None,
        atrous_encoder=True,
        backbone="resnet50",
    )
    x = np.random.RandomState(2).rand(2, CROP, CROP, 3).astype(np.float32)
    variables = net.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x),
        train=False,
    )
    params, batch_stats, loaded = convert_reference_deeplab(sd, variables)
    expected = len([k for k in sd if not k.endswith("num_batches_tracked")])
    assert loaded == expected, f"only {loaded}/{expected} tensors converted"
    out = net.apply(
        {"params": params, "batch_stats": batch_stats}, jnp.asarray(x), train=False
    )
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    with torch.no_grad():
        logits_t, _, atts_t = ref(xt, return_attentions=True, return_penultimate=True)
    assert len(out.attentions) == len(atts_t) == 6  # 5 backbone + ASPP
    # randomized BN stats inflate activations to O(100) here, so compare
    # relative (observed deltas <2e-3 relative)
    for aj, at in zip(out.attentions, atts_t):
        np.testing.assert_allclose(
            np.asarray(aj), _to_nhwc(at), rtol=5e-3, atol=TOL
        )
    np.testing.assert_allclose(
        np.asarray(out.logits), _to_nhwc(logits_t), rtol=5e-3, atol=TOL
    )


def test_training_trajectory_parity(pair):
    """3 SGD steps with identical weights/data: per-step CE losses must track
    the reference's torch trajectory (optimizer = SGD nesterov momentum 0.9
    wd 1e-4, value-clip 2.0 — reference trainer.py:347-348, nesterov.yaml).

    This chains forward parity, backward/gradient parity, and optimizer
    parity into one end-to-end check — the strongest mIoU-parity substitute
    available without VOC data.
    """
    import copy

    ref, net, variables, x = pair
    from bacs_tpu.ops.losses import cross_entropy as ce_jax
    from bacs_tpu.train.optim import make_optimizer

    lr = 0.01
    rng = np.random.RandomState(9)
    xs = rng.rand(3, 2, CROP, CROP, 3).astype(np.float32)
    ys = rng.randint(0, N_CLASSES, (3, 2, CROP, CROP)).astype(np.int64)

    # ---- torch side (train mode: batch stats + running-stat updates) ----
    ref_t = copy.deepcopy(ref)
    ref_t.train()
    opt = torch.optim.SGD(
        ref_t.parameters(), lr=lr, momentum=0.9, nesterov=True,
        weight_decay=1e-4,
    )
    torch_losses = []
    for i in range(3):
        xt = torch.from_numpy(np.transpose(xs[i], (0, 3, 1, 2)))
        yt = torch.from_numpy(ys[i])
        opt.zero_grad()
        logits = ref_t(xt)
        loss = torch.nn.functional.cross_entropy(logits, yt, ignore_index=255)
        loss.backward()
        torch.nn.utils.clip_grad_value_(ref_t.parameters(), 2.0)
        opt.step()
        torch_losses.append(float(loss.detach()))

    # ---- jax side ----
    tx = make_optimizer(
        {"_target_": "torch.optim.SGD", "lr": lr, "momentum": 0.9,
         "nesterov": True, "weight_decay": 1e-4},
        lambda step: lr,
    )
    params = variables["params"]
    stats = variables["batch_stats"]
    opt_state = tx.init(params)

    import optax

    def step_fn(params, stats, opt_state, xb, yb):
        def loss_fn(p):
            out, mut = net.apply(
                {"params": p, "batch_stats": stats}, xb, train=True,
                mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)},
            )
            return ce_jax(out.logits, yb, ignore_index=255), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state2 = tx.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return params2, new_stats, opt_state2, loss

    step_fn = jax.jit(step_fn)
    jax_losses = []
    for i in range(3):
        params, stats, opt_state, loss = step_fn(
            params, stats, opt_state,
            jnp.asarray(xs[i]), jnp.asarray(ys[i].astype(np.int32)),
        )
        jax_losses.append(float(loss))

    # step-0 loss is pure forward parity (tight); later steps compound the
    # train-mode BN conditioning measured in test_forward_train_parity
    np.testing.assert_allclose(jax_losses[0], torch_losses[0], atol=2e-3)
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-2)
    # and both trajectories actually learned something
    assert jax_losses[-1] < jax_losses[0]


# ---------------------------------------------------------------------------
# loss-term parity vs the reference's real training/loss_utils.py
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def lu():
    return load_reference_loss_utils()


def _rand_logits(rs, n=2, h=8, w=8, c=12):
    return rs.randn(n, h, w, c).astype(np.float32)


def _rand_labels(rs, n=2, h=8, w=8, c=12, p_ignore=0.1):
    lab = rs.randint(0, c, size=(n, h, w)).astype(np.int64)
    lab[rs.rand(n, h, w) < p_ignore] = 255
    return lab


def _t(a):
    return torch.from_numpy(np.transpose(a, (0, 3, 1, 2)) if a.ndim == 4 else a)


def test_unbiased_cross_entropy_parity(lu):
    from bacs_tpu.ops.losses import unbiased_cross_entropy

    rs = np.random.RandomState(0)
    logits, labels = _rand_logits(rs), _rand_labels(rs)
    old_cl = 7
    ref = lu.UnbiasedCrossEntropy(old_cl=old_cl)(_t(logits), _t(labels))
    got = unbiased_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), old_cl)
    np.testing.assert_allclose(float(got), float(ref), atol=TOL)


def test_unbiased_kd_parity(lu):
    from bacs_tpu.ops.losses import unbiased_knowledge_distillation

    rs = np.random.RandomState(1)
    new = _rand_logits(rs, c=12)
    old = _rand_logits(rs, c=9)
    ref = lu.UnbiasedKnowledgeDistillationLoss(alpha=1.0)(_t(new), _t(old))
    got = unbiased_knowledge_distillation(jnp.asarray(new), jnp.asarray(old))
    np.testing.assert_allclose(float(got), float(ref), atol=TOL)


def test_weighted_cross_entropy_parity(lu):
    from bacs_tpu.ops.losses import weighted_cross_entropy

    rs = np.random.RandomState(2)
    logits = _rand_logits(rs)
    labels = _rand_labels(rs)
    labels[0, :4] = 0  # ensure some background
    seen = rs.rand(2, 8, 8, 3).astype(np.float32)
    for ukd in (True, False):
        ref = lu.WeightedCrossEntropy(old_cl=7, ukd=ukd)(
            _t(logits), _t(labels), _t(seen), 2
        )
        got = weighted_cross_entropy(
            jnp.asarray(logits),
            jnp.asarray(labels),
            jnp.asarray(seen),
            old_classes=7,
            ukd=ukd,
        )
        np.testing.assert_allclose(float(got), float(ref), atol=TOL)


def test_entropy_parity(lu):
    from bacs_tpu.ops.losses import pixel_entropy

    rs = np.random.RandomState(3)
    probs = rs.dirichlet(np.ones(12), size=(2, 8, 8)).astype(np.float32)
    ref = lu.entropy(_t(probs))
    got = pixel_entropy(jnp.asarray(probs))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=TOL)


def test_icarl_parity(lu):
    from bacs_tpu.ops.losses import icarl_criterion

    rs = np.random.RandomState(4)
    logits = _rand_logits(rs)
    labels = _rand_labels(rs)
    old_out = 1.0 / (1.0 + np.exp(-_rand_logits(rs, c=9)))
    for bkg in (False, True):
        ref = lu.IcarlCriterion(bkg=bkg)(_t(logits), _t(labels), _t(old_out))
        got = icarl_criterion(
            jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(old_out), bkg=bkg
        )
        np.testing.assert_allclose(float(got), float(ref), atol=TOL)


def test_features_distillation_parity(lu):
    """PLOP local POD, exactly as loss/plop_loss.py:196-221 invokes it."""
    from bacs_tpu.ops.losses import features_distillation

    rs = np.random.RandomState(5)
    shapes = [(2, 16, 16, 64), (2, 8, 8, 128), (2, 8, 8, 256), (2, 8, 8, 256)]
    atts_old = [rs.randn(*s).astype(np.float32) for s in shapes]
    atts_new = [a + 0.1 * rs.randn(*a.shape).astype(np.float32) for a in atts_old]
    # last layer: sem logits where the student has 3 extra new-class channels
    sem_old = rs.randn(2, 8, 8, 9).astype(np.float32)
    sem_new = rs.randn(2, 8, 8, 12).astype(np.float32)
    atts_old.append(sem_old)
    atts_new.append(sem_new)

    ref = lu.features_distillation(
        [_t(a) for a in atts_old],
        [_t(a) for a in atts_new],
        collapse_channels="local",
        labels=None,
        index_new_class=9,
        pod_deeplab_mask=False,
        pod_deeplab_mask_factor=None,
        pod_factor=0.01,
        prepro="pow",
        deeplabmask_upscale=True,
        spp_scales=[1, 2, 4],
        pod_options={
            "switch": {
                "after": {"extra_channels": "sum", "factor": 0.0005, "type": "local"}
            }
        },
        outputs_old=None,
        use_pod_schedule=True,
        nb_current_classes=12,
        nb_new_classes=3,
    )
    got = features_distillation(
        [jnp.asarray(a) for a in atts_old],
        [jnp.asarray(a) for a in atts_new],
        index_new_class=9,
        nb_current_classes=12,
        nb_new_classes=3,
    )
    np.testing.assert_allclose(float(got), float(ref), atol=TOL)
