"""Golden-value loss tests: JAX ops vs torch formulas from the reference.

The reference had no unit tests (SURVEY.md §4); these pin our loss math to
the exact torch expressions of reference training/loss_utils.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from bacs_tpu.ops import losses as L

B, H, W, C = 2, 8, 8, 6
OLD = 3


@pytest.fixture()
def data(rng):
    logits = rng.randn(B, H, W, C).astype(np.float32)
    labels = rng.randint(0, C, size=(B, H, W)).astype(np.int32)
    labels[0, 0, :3] = 255  # ignore pixels
    return logits, labels


def _t(logits):  # NHWC → NCHW torch tensor
    return torch.tensor(np.moveaxis(logits, -1, 1))


def test_cross_entropy_matches_torch(data):
    logits, labels = data
    ours = L.cross_entropy(jnp.asarray(logits), jnp.asarray(labels), 255)
    ref = F.cross_entropy(
        _t(logits), torch.tensor(labels).long(), ignore_index=255
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_weighted_cross_entropy_class_weights(data):
    logits, labels = data
    w = np.array([0, 1, 1, 0.5, 2, 1], np.float32)
    ours = L.cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), 255,
        class_weights=jnp.asarray(w),
    )
    ref = F.cross_entropy(
        _t(logits), torch.tensor(labels).long(), weight=torch.tensor(w),
        ignore_index=255,
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_unbiased_cross_entropy_matches_reference_formula(data):
    """(reference: training/loss_utils.py:492-520)"""
    logits, labels = data
    ours = L.unbiased_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), OLD, 255
    )
    inputs = _t(logits)
    targets = torch.tensor(labels).long()
    outputs = torch.zeros_like(inputs)
    den = torch.logsumexp(inputs, dim=1)
    outputs[:, 0] = torch.logsumexp(inputs[:, 0:OLD], dim=1) - den
    outputs[:, OLD:] = inputs[:, OLD:] - den.unsqueeze(1)
    lab = targets.clone()
    lab[targets < OLD] = 0
    # NB the reference indexes nll with original label space where classes
    # in [OLD, C) keep their channel position
    ref = F.nll_loss(outputs, lab, ignore_index=255)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_unbiased_kd_matches_reference_formula(rng):
    """(reference: training/loss_utils.py:447-489)"""
    new = rng.randn(B, H, W, C).astype(np.float32)
    old = rng.randn(B, H, W, OLD).astype(np.float32)
    ours = L.unbiased_knowledge_distillation(
        jnp.asarray(new), jnp.asarray(old), alpha=1.0
    )
    inputs, targets = _t(new), _t(old)
    new_cl = C - OLD
    new_bkg_idx = torch.tensor([0] + list(range(OLD, C))).long()
    den = torch.logsumexp(inputs, dim=1)
    out_no_bgk = inputs[:, 1:-new_cl] - den.unsqueeze(1)
    out_bkg = (
        torch.logsumexp(torch.index_select(inputs, 1, new_bkg_idx), dim=1) - den
    )
    lab = torch.softmax(targets, dim=1)
    ref = (lab[:, 0] * out_bkg + (lab[:, 1:] * out_no_bgk).sum(1)) / OLD
    ref = -torch.mean(ref)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_icarl_matches_reference_formula(data, rng):
    """(reference: training/loss_utils.py:591-620)"""
    logits, labels = data
    old_sig = 1 / (1 + np.exp(-rng.randn(B, H, W, OLD).astype(np.float32)))
    ours = L.icarl_criterion(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(old_sig),
        bkg=False,
    )
    inputs = _t(logits)
    targets = torch.tensor(labels).long()
    n_cl = torch.tensor(C)
    labels_new = torch.where(targets != 255, targets, n_cl)
    tgt = F.one_hot(labels_new, C + 1).float().permute(0, 3, 1, 2)[:, :C]
    tgt[:, :OLD] = _t(old_sig)
    ref = (
        F.binary_cross_entropy_with_logits(inputs, tgt, reduction="none")
        .sum(dim=1)
        .mean()
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_binary_focal_matches_formula(rng):
    x = rng.randn(B, H, W).astype(np.float32)
    t = rng.randint(0, 2, (B, H, W)).astype(np.int32)
    ours = L.binary_focal_loss(jnp.asarray(x), jnp.asarray(t), gamma=2.0)
    xt, tt = torch.tensor(x), torch.tensor(t).float()
    bce = F.binary_cross_entropy_with_logits(xt, tt, reduction="none")
    pt = torch.exp(-bce)
    ref = ((1 - pt) ** 2 * bce).mean()
    np.testing.assert_allclose(float(ours), float(ref), rtol=2e-4)


def test_entropy_matches(rng):
    p = np.abs(rng.randn(B, H, W, C).astype(np.float32))
    p = p / p.sum(-1, keepdims=True)
    ours = L.pixel_entropy(jnp.asarray(p))
    pt = _t(p)
    factor = 1 / np.log(C + 1e-8)
    ref = -factor * torch.mean(pt * torch.log(pt + 1e-8), dim=1)
    np.testing.assert_allclose(
        np.asarray(ours), ref.numpy(), rtol=1e-4, atol=1e-6
    )


def test_local_pod_distance_matches_torch(rng):
    """Embedding layouts differ; the frobenius distance must not
    (reference: training/loss_utils.py:69-105)."""
    a = rng.randn(B, 8, 8, 4).astype(np.float32)
    b = rng.randn(B, 8, 8, 4).astype(np.float32)
    ea = L.local_pod(jnp.square(jnp.asarray(a)))
    eb = L.local_pod(jnp.square(jnp.asarray(b)))
    ours = jnp.linalg.norm(ea - eb, axis=-1)

    def torch_local_pod(x):
        x = torch.pow(_t(x), 2)
        bsz, c, h, w = x.shape
        emb = []
        for scale in (1, 2, 4):
            k = w // scale
            for i in range(scale):
                for j in range(scale):
                    tensor = x[..., i * k : (i + 1) * k, j * k : (j + 1) * k]
                    emb.append(tensor.mean(3).reshape(bsz, -1))
                    emb.append(tensor.mean(2).reshape(bsz, -1))
        return torch.cat(emb, 1)

    ref = torch.norm(torch_local_pod(a) - torch_local_pod(b), dim=-1)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4)


def test_weighted_ce_reference_formula(rng):
    """BACS WeightedCrossEntropy (reference: loss_utils.py:523-588)."""
    logits = rng.randn(B, H, W, C).astype(np.float32)
    labels = rng.randint(0, C, (B, H, W)).astype(np.int32)
    seen = 1 / (1 + np.exp(-rng.randn(B, H, W, 2).astype(np.float32)))
    ours = L.weighted_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(seen),
        old_classes=OLD, gamma=2.0, threshold=0.5, ukd=True,
    )

    inputs = _t(logits)
    targets = torch.tensor(labels).long()
    snsp = _t(seen)
    max_seen = snsp.max(1)[0]
    max_seen[max_seen > 0.5] = 1.0
    weights = torch.zeros_like(inputs)
    weights[:, 0] = max_seen
    N = inputs.shape[0]
    w = weights.view(N, C, -1).transpose(1, 2).contiguous().view(-1, C)
    masked_targets = (targets * (targets != 255)).view(-1, 1)
    w = w.gather(1, masked_targets).view(-1)
    focal = (1.0 - w) ** 2
    den = torch.logsumexp(inputs, dim=1)
    outputs = torch.zeros_like(inputs)
    outputs[:, 0] = inputs[:, 0] - den
    outputs[:, 1] = torch.logsumexp(inputs[:, 1:], dim=1) - den
    lab_bg_fg = targets.clone()
    lab_bg_fg[(targets != 0) & (targets != 255)] = 1
    loss_bg_fg = focal * F.nll_loss(
        outputs, lab_bg_fg, ignore_index=255, reduction="none"
    ).view(-1)
    lab_new = targets.clone()
    lab_new[targets < OLD] = 0
    outputs = torch.zeros_like(inputs)
    outputs[:, 0] = torch.logsumexp(inputs[:, 0:OLD], dim=1) - den
    outputs[:, OLD:] = inputs[:, OLD:] - den.unsqueeze(1)
    loss_new = F.nll_loss(
        outputs, lab_new, ignore_index=255, reduction="none"
    ).view(-1)
    ref = (loss_bg_fg + loss_new).mean()
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)
