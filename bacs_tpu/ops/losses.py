"""Segmentation losses for continual learning, NHWC, jit-friendly.

Functional re-implementations (not ports) of the loss math used by the
reference framework:

- plain/weighted cross entropy           (reference: loss/base_loss.py:236-239)
- binary focal loss (seen detector)      (reference: base_loss.py:63-70, smp FocalLoss)
- UnbiasedCrossEntropy   [MiB]           (reference: training/loss_utils.py:492-520)
- UnbiasedKnowledgeDistillationLoss      (reference: training/loss_utils.py:447-489)
- WeightedCrossEntropy   [BACS]          (reference: training/loss_utils.py:523-588)
- IcarlCriterion                         (reference: training/loss_utils.py:591-620)
- entropy                                (reference: training/loss_utils.py:399-411)
- local POD features distillation [PLOP] (reference: training/loss_utils.py:69-396)

Conventions: logits are [N, H, W, C] (NHWC — the TPU-native layout), labels are
[N, H, W] int32, `ignore_index` pixels are dropped from every reduction.  All
reductions are mask-weighted sums so the functions are safe under jit/vmap and
never produce NaN from empty masks.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = 1e-8


def _valid_mask(labels: Array, ignore_index: int) -> Array:
    return (labels != ignore_index).astype(jnp.float32)


def _safe_mean(values: Array, mask: Array) -> Array:
    """Mean of `values` over positions where mask==1; 0 if mask empty."""
    denom = jnp.sum(mask)
    return jnp.sum(values * mask) / jnp.maximum(denom, 1.0)


def cross_entropy(
    logits: Array,
    labels: Array,
    ignore_index: int = 255,
    class_weights: Array | None = None,
    reduction: str = "mean",
) -> Array:
    """Softmax cross entropy with ignore index and optional per-class weights.

    Matches torch ``F.cross_entropy`` semantics: with ``class_weights`` the
    "mean" reduction divides by the *sum of weights* of the target pixels,
    not by the pixel count (reference relies on this in the ER replay loss,
    loss/experience_replay.py:244-272).
    """
    num_classes = logits.shape[-1]
    mask = _valid_mask(labels, ignore_index)
    safe_labels = jnp.where(mask > 0, labels, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    if class_weights is not None:
        w = class_weights.astype(jnp.float32)[safe_labels] * mask
    else:
        w = mask
    if reduction == "none":
        return nll * w
    if reduction == "sum":
        return jnp.sum(nll * w)
    # mean
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), _EPS)


def binary_focal_loss(
    logits: Array,
    targets: Array,
    gamma: float = 2.0,
    alpha: float | None = None,
    ignore_index: int = 255,
) -> Array:
    """Binary focal loss with logits, mean over non-ignored pixels.

    Semantics of segmentation_models_pytorch ``FocalLoss(mode="binary")`` used
    for the BACS seen/fg detector (reference: loss/base_loss.py:63-70,255-272):
    ``loss = (1 - pt)^gamma * BCE`` with optional alpha-balancing.

    logits/targets are broadcastable; `targets` is 0/1 float (or ignore_index).
    """
    t = targets.astype(jnp.float32)
    mask = (targets != ignore_index).astype(jnp.float32)
    t = jnp.where(mask > 0, t, 0.0)
    x = logits.astype(jnp.float32)
    # numerically stable BCE-with-logits = max(x,0) - x*t + log(1+exp(-|x|))
    bce = jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    logpt = -bce
    pt = jnp.exp(logpt)
    focal = (1.0 - pt) ** gamma * bce
    if alpha is not None:
        focal = focal * (alpha * t + (1.0 - alpha) * (1.0 - t))
    return _safe_mean(focal, mask)


def unbiased_cross_entropy(
    logits: Array,
    labels: Array,
    old_classes: int,
    ignore_index: int = 255,
    reduction: str = "mean",
) -> Array:
    """MiB unbiased CE: old classes (and bg) fold into channel 0.

    p(bg|x) := sum over {0..old_classes-1}; any label < old_classes maps to 0
    (reference: training/loss_utils.py:492-520).
    """
    mask = _valid_mask(labels, ignore_index)
    lse = jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1)
    log_probs = logits.astype(jnp.float32) - lse[..., None]
    # channel 0 = log p(any class in [0, old_classes))
    log_p_old = (
        jax.nn.logsumexp(logits[..., :old_classes].astype(jnp.float32), axis=-1) - lse
    )
    outputs = jnp.concatenate(
        [log_p_old[..., None], log_probs[..., old_classes:]], axis=-1
    )
    remapped = jnp.where(labels < old_classes, 0, labels - (old_classes - 1))
    remapped = jnp.where(mask > 0, remapped, 0).astype(jnp.int32)
    nll = -jnp.take_along_axis(outputs, remapped[..., None], axis=-1)[..., 0]
    if reduction == "none":
        return nll * mask
    return _safe_mean(nll, mask)


def unbiased_knowledge_distillation(
    new_logits: Array,
    old_logits: Array,
    alpha: float = 1.0,
    mask: Array | None = None,
) -> Array:
    """MiB unbiased KD: teacher's bg prob matches student's bg+new prob mass.

    new_logits: [..., C_new]; old_logits: [..., C_old], C_new > C_old
    (reference: training/loss_utils.py:447-489).
    """
    c_new_total = new_logits.shape[-1]
    c_old = old_logits.shape[-1]
    x = new_logits.astype(jnp.float32)
    den = jax.nn.logsumexp(x, axis=-1)
    # log p(old class i), for i in 1..c_old-1
    outputs_no_bkg = x[..., 1:c_old] - den[..., None]
    # log p(bg or any new class)
    bkg_and_new = jnp.concatenate([x[..., :1], x[..., c_old:c_new_total]], axis=-1)
    outputs_bkg = jax.nn.logsumexp(bkg_and_new, axis=-1) - den
    labels = jax.nn.softmax(old_logits.astype(jnp.float32) * alpha, axis=-1)
    loss = (
        labels[..., 0] * outputs_bkg
        + jnp.sum(labels[..., 1:] * outputs_no_bkg, axis=-1)
    ) / c_old
    if mask is not None:
        loss = loss * mask.astype(jnp.float32)
    return -jnp.mean(loss)


def weighted_cross_entropy(
    logits: Array,
    labels: Array,
    seen_probs: Array,
    old_classes: int,
    gamma: float = 2.0,
    threshold: float = 0.5,
    ukd: bool = True,
    ignore_index: int = 255,
) -> Array:
    """BACS weighted CE: focal bg/fg split + new-vs-rest unbiased CE.

    Two terms, each averaged over valid pixels, then summed
    (reference: training/loss_utils.py:523-588):

    1. bg/fg two-way loss. The bg channel weight per-pixel is the max
       seen-probability (clamped to 1 above `threshold`); pixels whose target
       class has weight w get focal modulation (1-w)^gamma.  Only the
       background class (label 0) carries a non-zero weight row.
    2. new-vs-rest: unbiased CE over {collapsed-old, new classes}.

    seen_probs: [N, h, w, T] sigmoid seen-probabilities per previous task
    (will be max-reduced); spatially resized by the caller to match labels.
    """
    x = logits.astype(jnp.float32)
    mask = _valid_mask(labels, ignore_index)
    safe_labels = jnp.where(mask > 0, labels, 0).astype(jnp.int32)

    max_seen = jax.lax.stop_gradient(jnp.max(seen_probs, axis=-1))
    max_seen = jnp.where(max_seen > threshold, 1.0, max_seen)
    # per-pixel weight: max_seen where target==0 (bg), else 0
    pixel_w = jnp.where(safe_labels == 0, max_seen, 0.0)
    focal_mod = (1.0 - pixel_w) ** gamma

    den = jax.nn.logsumexp(x, axis=-1)
    # --- term 1: bg vs fg ---
    log_p_bg = x[..., 0] - den
    log_p_fg = jax.nn.logsumexp(x[..., 1:], axis=-1) - den
    labels_bg_fg = jnp.where(safe_labels != 0, 1, 0)
    nll_bg_fg = -jnp.where(labels_bg_fg == 0, log_p_bg, log_p_fg)
    loss_bg_fg = focal_mod * nll_bg_fg

    # --- term 2: new vs rest (unbiased) ---
    labels_new_vs_rest = jnp.where(safe_labels < old_classes, 0, safe_labels)
    if ukd:
        log_p_old = jax.nn.logsumexp(x[..., :old_classes], axis=-1) - den
    else:
        log_p_old = jnp.zeros_like(den)
    log_probs = x - den[..., None]
    outputs = jnp.concatenate(
        [log_p_old[..., None], log_probs[..., 1:]], axis=-1
    )  # channel 0 replaced, channels >= old_classes match log p
    nll_new = -jnp.take_along_axis(
        outputs,
        jnp.where(labels_new_vs_rest == 0, 0, labels_new_vs_rest)[..., None],
        axis=-1,
    )[..., 0]

    # reference quirk: `.mean()` over ALL pixels — ignored pixels contribute
    # zero but count in the denominator (loss_utils.py:571-587)
    return jnp.mean((loss_bg_fg + nll_new) * mask)


def icarl_criterion(
    logits: Array,
    labels: Array,
    old_outputs: Array,
    bkg: bool = False,
    ignore_index: int = 255,
) -> Array:
    """iCaRL BCE-with-logits vs one-hot targets with old channels distilled.

    `old_outputs` is sigmoid(prev logits) [..., C_old]
    (reference: training/loss_utils.py:591-620; loss/icarl_loss.py:42-67).
    Per-pixel loss sums class contributions; mean over all pixels (the
    reference's mean includes ignore pixels' zeroed rows only via the one-hot
    trim, so we replicate: ignore pixels become all-zero one-hot rows).
    """
    num_classes = logits.shape[-1]
    c_old = old_outputs.shape[-1]
    mask = _valid_mask(labels, ignore_index)
    safe_labels = jnp.where(mask > 0, labels, 0).astype(jnp.int32)
    one_hot = jax.nn.one_hot(safe_labels, num_classes) * mask[..., None]
    if bkg:
        targets = jnp.concatenate(
            [
                one_hot[..., :1],
                old_outputs[..., 1:c_old],
                one_hot[..., c_old:],
            ],
            axis=-1,
        )
    else:
        targets = jnp.concatenate([old_outputs, one_hot[..., c_old:]], axis=-1)
    x = logits.astype(jnp.float32)
    bce = jnp.maximum(x, 0.0) - x * targets + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(jnp.sum(bce, axis=-1))


def pixel_entropy(probs: Array) -> Array:
    """Normalized per-pixel entropy of [..., C] probabilities → [...]

    (reference: training/loss_utils.py:399-411).
    """
    c = probs.shape[-1]
    factor = 1.0 / math.log(c + _EPS)
    return -factor * jnp.mean(probs * jnp.log(probs + _EPS), axis=-1)


def local_pod(
    x: Array,
    spp_scales: Sequence[int] = (1, 2, 4),
) -> Array:
    """Local POD embedding: per-region width/height-mean pools, concatenated.

    x: [N, H, W, C] (already preprocessed, e.g. squared).  Output [N, D].
    (reference: training/loss_utils.py:69-105 `_local_pod`).

    The flatten order differs from the torch version but is consistent between
    student and teacher, so the frobenius distance is identical.
    """
    n, h, w, c = x.shape
    emb = []
    for scale in spp_scales:
        kh, kw = h // scale, w // scale
        for i in range(scale):
            for j in range(scale):
                region = x[:, i * kh : (i + 1) * kh, j * kw : (j + 1) * kw, :]
                horizontal = jnp.mean(region, axis=2).reshape(n, -1)  # pool width
                vertical = jnp.mean(region, axis=1).reshape(n, -1)  # pool height
                emb.append(horizontal)
                emb.append(vertical)
    return jnp.concatenate(emb, axis=1)


def features_distillation(
    attentions_old: Sequence[Array],
    attentions_new: Sequence[Array],
    index_new_class: int,
    nb_current_classes: int,
    nb_new_classes: int,
    pod_factor: float = 0.01,
    last_layer_factor: float = 0.0005,
    spp_scales: Sequence[int] = (1, 2, 4),
    use_pod_schedule: bool = True,
) -> Array:
    """PLOP Local POD distillation over backbone attention maps + logits.

    Implements the path the reference actually exercises
    (reference: training/loss_utils.py:108-396 with collapse_channels="local",
    prepro="pow", handle_extra_channels="sum", pod_options switching the last
    layer to factor 0.0005; called from loss/plop_loss.py:196-221): per layer,
    square activations, build local POD embeddings, take per-sample frobenius
    distance, scale by ``factor * sqrt(C_cur / C_new)`` and average over
    layers.  The last entry of each attention list is the sem-logits map; the
    student's extra new-class channels there are folded into background.
    """
    assert len(attentions_new) == len(attentions_old)
    n_layers = len(attentions_new)
    total = jnp.asarray(0.0, jnp.float32)
    for i, (a, b) in enumerate(zip(attentions_old, attentions_new)):
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        if a.shape[-1] != b.shape[-1]:
            # last layer: student (b) has new-class channels; sum them into bg
            bg = b[..., :1] + jnp.sum(b[..., index_new_class:], axis=-1, keepdims=True)
            b = jnp.concatenate([bg, b[..., 1:index_new_class]], axis=-1)
        a = jnp.square(a)
        b = jnp.square(b)
        ea = local_pod(a, spp_scales)
        eb = local_pod(b, spp_scales)
        # sqrt(x+eps): unlike torch, JAX's norm has NaN gradient at exactly
        # zero (prev==current attentions can match bitwise after cloning)
        layer = jnp.mean(
            jnp.sqrt(jnp.sum(jnp.square(ea - eb), axis=-1) + 1e-12)
        )
        layer = layer * (last_layer_factor if i == n_layers - 1 else pod_factor)
        if use_pod_schedule:
            layer = layer * math.sqrt(nb_current_classes / max(nb_new_classes, 1))
        total = total + layer
    return total / n_layers
