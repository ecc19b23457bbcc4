"""Fused bilinear-upsample + cross-entropy: the full-res logits never exist.

The reference (and any naive port) materializes [N, 512, 512, C] float32
logits for the loss (reference: networks/deeplab_v3.py:158-160 upsample →
F.cross_entropy).  Inside the real train step the XLA-composed
resize+log-softmax+gather path costs +66 ms at 512² batch 16 (memory-pressure
scheduling materializes the 0.35 GB tensor repeatedly); this op computes
CE(bilinear_upsample(sem_logits), labels) tile-by-tile in VMEM instead.

Decomposition (v2 kernel, round 2):

    outside:  z = W-interp(sem)  →  [N, h, c, W]  (tiny: the W upsample on
              the SMALL h side, one XLA einsum, ~50 MB f32 at 512²/b16),
              channels padded to the sublane multiple with −1e30 so the
              softmax needs no channel masking in-kernel.
    kernel:   per 32-output-row block, H-interp only the ~16-row input
              window that block actually reads (the dense [R, h] interp
              matrix is 8×-upsampling sparse — block-local slicing cuts the
              MXU work 4-12×), then log-sum-exp + label gather over
              [R, c, W] tiles with channels on SUBLANES (c≈24, not a
              128-lane pad: 5× less VPU work than channels-on-lanes).
    backward: d tile = softmax − onehot recomputed per block, transposed
              H-interp accumulated into dz; the W-interp transpose runs
              outside as one einsum.

Structure (round 4 refactor): ALL scaffolding — interp matrices, operand
prep, BlockSpecs, the kernel head/tail (grid, init, tile read, scalar-slot
store, dz scatter), call wrappers and the TPU gate — lives in
ops/upsample_tiles.py; this module holds each loss variant's per-tile MATH
plus the custom-VJP primitives and the public mean ops.  The differentiable
primitives return raw SUMS (loss_sum, count) with a static `interp` spec;
the public mean ops divide outside (AD through the division distributes
1/count into the kernel's g).  The `interp` spec `(scale, offset)`
generalizes the H matrix to SHARD-LOCAL windows, which is what makes the
kernels compose with GSPMD spatial partitioning: `spatial_*` wrappers
shard_map over a (data, space) mesh, halo-exchange ONE boundary row per
neighbor (ppermute — replicate-padding at the global edges is
mathematically identical to the clamped matrix), run the same Pallas
kernels on the local block, and psum the partial sums.

Semantics match ops/interpolate.resize_bilinear(align_corners=False) +
ops/losses.cross_entropy (mean over non-ignore pixels); a jnp reference path
backs non-TPU platforms and the unit tests.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from bacs_tpu.ops.upsample_tiles import (
    NEG,
    ROW_BLOCK,
    block_kh as _block_kh,
    call_dz,
    call_sums,
    gvec_spec as _gvec_spec,
    kmats as _kmats,
    make_dz_kernel,
    make_pair_dz_kernel,
    make_pair_sums_kernel,
    make_sums_kernel,
    ms_spec as _ms_spec,
    onehot_valid,
    pad_w as _pad_w,
    prep_call as _prep_call,
    prep_call_pair as _prep_call_pair,
    upsample_jnp as _upsample_jnp,
    use_pallas as _use_pallas,
    w_interp as _w_interp,
    wvec_spec as _wvec_spec,
)

Array = jax.Array


# ---------------------------------------------------------------------------
# plain CE: per-tile math, sums primitive + public mean op
# ---------------------------------------------------------------------------


def _ce_sums_jnp(sem, labels, kh, kw, ignore_index):
    up = _upsample_jnp(sem, kh, kw)
    mask = labels != ignore_index
    safe = jnp.where(mask, labels, 0)
    lse = jax.nn.logsumexp(up, axis=-1)
    lab = jnp.take_along_axis(up, safe[..., None], axis=-1)[..., 0]
    loss_sum = jnp.sum((lse - lab) * mask)
    return loss_sum, jnp.sum(mask).astype(jnp.float32)


def _ce_tile_sums(tile, labels):
    """(Σ nll over valid pixels, valid count) for one [R, c, W] tile.
    Padded channels were filled with −1e30 upstream: exp(pad − m) == 0,
    so no channel mask is needed anywhere."""
    m = jnp.max(tile, axis=1)
    e = jnp.exp(tile - m[:, None, :])
    lse = m + jnp.log(jnp.sum(e, axis=1))
    valid, _, _, onehot = onehot_valid(labels, tile.shape[1])
    lab = jnp.sum(onehot * tile, axis=1)
    loss_sum = jnp.sum(jnp.where(valid, lse - lab, 0.0))
    return loss_sum, jnp.sum(valid.astype(jnp.float32))


def _ce_tile_grad(tile, labels, g):
    m = jnp.max(tile, axis=1, keepdims=True)
    e = jnp.exp(tile - m)
    softmax = e / jnp.sum(e, axis=1, keepdims=True)
    valid, _, _, onehot = onehot_valid(labels, tile.shape[1])
    return (softmax - onehot) * (valid.astype(jnp.float32) * g)[:, None, :]


def _ce_sums_pallas(sem, labels, kh, kw):
    # same pallas_call as the per-image variant, reduced over images —
    # one kernel instance to maintain
    ls, cnt = _ce_sums_per_image_pallas(sem, labels, kh, kw)
    return jnp.sum(ls), jnp.sum(cnt)


def _dsem_pallas(sem, labels, kh, kw, g, per_image=False):
    return call_dz(
        make_dz_kernel(_ce_tile_grad, per_image_g=per_image),
        _prep_call(sem, labels, kh, kw), kw, sem, g, g_is_vec=per_image,
    )


def _ce_sums(sem, labels, out_hw, ignore_index, interp):
    kh, kw = _kmats(sem, out_hw, interp)
    if _use_pallas(sem, out_hw) and ignore_index == 255:
        return _ce_sums_pallas(sem, labels, kh, kw)
    return _ce_sums_jnp(sem, labels, kh, kw, ignore_index)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def upsampled_ce_sums(
    sem_logits: Array,
    labels: Array,
    out_hw: Tuple[int, int],
    ignore_index: int,
    interp: Optional[Tuple[float, float]],
) -> Tuple[Array, Array]:
    """(Σ CE(upsample(sem), labels) over valid pixels, valid count).

    The differentiable primitive all public/spatial variants build on;
    `interp` is the static (scale, offset) of a shard-local H window."""
    return _ce_sums(sem_logits, labels, out_hw, ignore_index, interp)


def _uces_fwd(sem, labels, out_hw, ignore_index, interp):
    ls, ct = _ce_sums(sem, labels, out_hw, ignore_index, interp)
    return (ls, ct), (sem, labels)


def _uces_bwd(out_hw, ignore_index, interp, res, g):
    g_sum = g[0]  # the count output carries no sem gradient
    sem, labels = res
    kh, kw = _kmats(sem, out_hw, interp)
    if _use_pallas(sem, out_hw) and ignore_index == 255:
        dsem = _dsem_pallas(sem, labels, kh, kw, g_sum.astype(jnp.float32))
        return dsem, None
    up = _upsample_jnp(sem, kh, kw)
    mask = labels != ignore_index
    safe = jnp.where(mask, labels, 0)
    soft = jax.nn.softmax(up, axis=-1)
    onehot = jax.nn.one_hot(safe, sem.shape[-1])
    dup = (soft - onehot) * mask[..., None] * g_sum
    dsem = jnp.einsum("Ww,nHWc->nHwc", jnp.asarray(kw), dup)
    dsem = jnp.einsum("Hh,nHwc->nhwc", jnp.asarray(kh), dsem).astype(sem.dtype)
    return dsem, None


upsampled_ce_sums.defvjp(_uces_fwd, _uces_bwd)


def upsampled_cross_entropy(
    sem_logits: Array,
    labels: Array,
    out_hw: Tuple[int, int],
    ignore_index: int = 255,
) -> Array:
    """mean CE(bilinear_upsample(sem_logits), labels)."""
    ls, ct = upsampled_ce_sums(sem_logits, labels, out_hw, ignore_index, None)
    return ls / jnp.maximum(ct, 1.0)


# ---------------------------------------------------------------------------
# per-class-weighted variant (ER / dark++ replay CE: torch weighted-mean
# semantics — sum(w[y]·nll) / sum(w[y]); the weight vector is a constant
# class mask, so it gets a zero cotangent)
# ---------------------------------------------------------------------------


def _wce_sums_jnp(sem, labels, weights, kh, kw, ignore_index):
    up = _upsample_jnp(sem, kh, kw)
    mask = labels != ignore_index
    safe = jnp.where(mask, labels, 0)
    lse = jax.nn.logsumexp(up, axis=-1)
    lab = jnp.take_along_axis(up, safe[..., None], axis=-1)[..., 0]
    wpix = weights.astype(jnp.float32)[safe] * mask
    return jnp.sum((lse - lab) * wpix), jnp.sum(wpix)


def _wce_pixel_weights(labels, w_ref, tile_c):
    """Per-pixel weight w[y]·valid from the [c_pad, 1] class vector
    (pad channels carry weight 0)."""
    valid, _, _, onehot = onehot_valid(labels, tile_c)
    wpix = jnp.sum(onehot * w_ref[0][None, :, :], axis=1)
    return valid, onehot, wpix * valid.astype(jnp.float32)


def _wce_tile_sums(tile, labels, w_ref):
    m = jnp.max(tile, axis=1)
    e = jnp.exp(tile - m[:, None, :])
    lse = m + jnp.log(jnp.sum(e, axis=1))
    _, onehot, wpix = _wce_pixel_weights(labels, w_ref, tile.shape[1])
    lab = jnp.sum(onehot * tile, axis=1)
    return jnp.sum((lse - lab) * wpix), jnp.sum(wpix)


def _wce_tile_grad(tile, labels, g, w_ref):
    m = jnp.max(tile, axis=1, keepdims=True)
    e = jnp.exp(tile - m)
    softmax = e / jnp.sum(e, axis=1, keepdims=True)
    _, onehot, wpix = _wce_pixel_weights(labels, w_ref, tile.shape[1])
    return (softmax - onehot) * (wpix * g)[:, None, :]


def _wce_sums_pallas(sem, labels, weights, kh, kw):
    prep = _prep_call(sem, labels, kh, kw)
    out = call_sums(
        make_sums_kernel(_wce_tile_sums), prep,
        extras=(_pad_w(weights, prep[2]["c_pad"]),),
        extra_specs=(_wvec_spec(prep[2]),),
    )
    return jnp.sum(out[:, 0, 0]), jnp.sum(out[:, 0, 1])


def _dsem_pallas_w(sem, labels, weights, kh, kw, g):
    prep = _prep_call(sem, labels, kh, kw)
    return call_dz(
        make_dz_kernel(_wce_tile_grad), prep, kw, sem, g,
        extras=(_pad_w(weights, prep[2]["c_pad"]),),
        extra_specs=(_wvec_spec(prep[2]),),
    )


def _wce_sums(sem, labels, weights, out_hw, ignore_index, interp):
    kh, kw = _kmats(sem, out_hw, interp)
    if _use_pallas(sem, out_hw) and ignore_index == 255:
        return _wce_sums_pallas(sem, labels, weights, kh, kw)
    return _wce_sums_jnp(sem, labels, weights, kh, kw, ignore_index)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def upsampled_wce_sums(
    sem_logits: Array,
    labels: Array,
    class_weights: Array,
    out_hw: Tuple[int, int],
    ignore_index: int,
    interp: Optional[Tuple[float, float]],
) -> Tuple[Array, Array]:
    """(Σ w[y]·CE over valid pixels, Σ w[y]) — weights are a CONSTANT
    (like torch's `weight=`): their VJP cotangent is hard zero."""
    return _wce_sums(sem_logits, labels, class_weights, out_hw, ignore_index,
                     interp)


def _uwces_fwd(sem, labels, weights, out_hw, ignore_index, interp):
    ls, ws = _wce_sums(sem, labels, weights, out_hw, ignore_index, interp)
    return (ls, ws), (sem, labels, weights)


def _uwces_bwd(out_hw, ignore_index, interp, res, g):
    g_sum = g[0]
    sem, labels, weights = res
    kh, kw = _kmats(sem, out_hw, interp)
    if _use_pallas(sem, out_hw) and ignore_index == 255:
        dsem = _dsem_pallas_w(sem, labels, weights, kh, kw,
                              g_sum.astype(jnp.float32))
        return dsem, None, jnp.zeros_like(weights)
    up = _upsample_jnp(sem, kh, kw)
    mask = labels != ignore_index
    safe = jnp.where(mask, labels, 0)
    soft = jax.nn.softmax(up, axis=-1)
    onehot = jax.nn.one_hot(safe, sem.shape[-1])
    wpix = weights.astype(jnp.float32)[safe] * mask
    dup = (soft - onehot) * (wpix * g_sum)[..., None]
    dsem = jnp.einsum("Ww,nHWc->nHwc", jnp.asarray(kw), dup)
    dsem = jnp.einsum("Hh,nHwc->nhwc", jnp.asarray(kh), dsem).astype(sem.dtype)
    return dsem, None, jnp.zeros_like(weights)


upsampled_wce_sums.defvjp(_uwces_fwd, _uwces_bwd)


def upsampled_weighted_cross_entropy(
    sem_logits: Array,
    labels: Array,
    class_weights: Array,
    out_hw: Tuple[int, int],
    ignore_index: int = 255,
) -> Array:
    """torch-semantics weighted mean CE of the bilinear-upsampled logits:
    sum(w[y]·nll) / sum(w[y]) over valid pixels."""
    ls, ws = upsampled_wce_sums(
        sem_logits, labels, class_weights, out_hw, ignore_index, None
    )
    return ls / jnp.maximum(ws, 1e-8)


# ---------------------------------------------------------------------------
# BACS seen-prob weighted CE (the headline method's main loss):
# focal bg/fg split + new-vs-rest unbiased CE, fused with the upsample
# (ops/losses.weighted_cross_entropy semantics, reference:
# training/loss_utils.py:523-588).  `max_seen` is the stop-gradded
# per-pixel max seen-probability at FULL resolution.
# ---------------------------------------------------------------------------


def _bacs_wce_sum_jnp(sem, labels, max_seen, kh, kw, old_classes, gamma,
                      threshold, ukd, ignore_index):
    """Fallback = resize + the golden-tested weighted_cross_entropy, scaled
    back to a SUM over all pixels (the op's mean divides by n_tot)."""
    from bacs_tpu.ops.losses import weighted_cross_entropy

    up = _upsample_jnp(sem, kh, kw)
    mean = weighted_cross_entropy(
        up, labels, max_seen[..., None], old_classes, gamma=gamma,
        threshold=threshold, ukd=ukd, ignore_index=ignore_index,
    )
    n_tot = labels.shape[0] * labels.shape[1] * labels.shape[2]
    return mean * n_tot


def _bacs_terms(tile, labels, ms, old_classes, gamma, threshold, ukd):
    """Shared per-block math: returns (loss_map [R,W], grad [R,c,W])."""
    c_pad = tile.shape[1]
    m = jnp.max(tile, axis=1, keepdims=True)
    e = jnp.exp(tile - m)  # pad channels are -1e30 -> e == 0
    se = jnp.sum(e, axis=1, keepdims=True)
    p = e / se  # [R, c, W]
    den = m[:, 0, :] + jnp.log(se[:, 0, :])  # lse over channels

    valid, safe, ch, onehot = onehot_valid(labels, c_pad)
    is_fg_ch = (ch >= 1).astype(jnp.float32)
    is_old_ch = (ch < old_classes).astype(jnp.float32)

    eps = 1e-30
    e_fg = e * is_fg_ch
    se_fg = jnp.sum(e_fg, axis=1, keepdims=True)
    lse_fg = m[:, 0, :] + jnp.log(se_fg[:, 0, :] + eps)
    s_fg = e_fg / (se_fg + eps)
    e_old = e * is_old_ch
    se_old = jnp.sum(e_old, axis=1, keepdims=True)
    lse_old = m[:, 0, :] + jnp.log(se_old[:, 0, :] + eps)
    s_old = e_old / (se_old + eps)

    x0 = jnp.sum(jnp.where(ch == 0, tile, 0.0), axis=1)
    lab_logit = jnp.sum(onehot * tile, axis=1)

    is_bg = (safe == 0).astype(jnp.float32)
    msf = jnp.where(ms > threshold, 1.0, ms)
    pixel_w = is_bg * msf
    fm = (1.0 - pixel_w) ** gamma

    # term 1: bg/fg focal
    l1 = jnp.where(safe == 0, fm * (den - x0), den - lse_fg)
    e0 = (ch == 0).astype(jnp.float32)
    g1 = jnp.where(
        (safe == 0)[:, None, :],
        fm[:, None, :] * (p - e0),
        p - s_fg,
    )
    # term 2: new-vs-rest unbiased.  With ukd=False the reference zeroes
    # the collapsed-old channel (loss_utils.py:570-574 outputs[:,0] = 0),
    # so old-class pixels contribute NO loss and NO gradient from term 2.
    if ukd:
        l2_old = den - lse_old
        g2_old = p - s_old
    else:
        l2_old = jnp.zeros_like(den)
        g2_old = jnp.zeros_like(p)
    l2 = jnp.where(safe < old_classes, l2_old, den - lab_logit)
    g2 = jnp.where((safe < old_classes)[:, None, :], g2_old, p - onehot)

    vm = valid.astype(jnp.float32)
    return (l1 + l2) * vm, (g1 + g2) * vm[:, None, :]


def _bacs_pallas(sem, labels, max_seen, kh, kw, old_classes, gamma,
                 threshold, ukd, want_grad, g=None):
    prep = _prep_call(sem, labels, kh, kw)
    extras = (max_seen.astype(jnp.float32),)
    extra_specs = (_ms_spec(prep[2]),)

    def sums(tile, labels_b, ms_ref):
        loss_map, _ = _bacs_terms(tile, labels_b, ms_ref[0], old_classes,
                                  gamma, threshold, ukd)
        return (jnp.sum(loss_map),)

    def grad(tile, labels_b, g_s, ms_ref):
        _, gmap = _bacs_terms(tile, labels_b, ms_ref[0], old_classes,
                              gamma, threshold, ukd)
        return gmap * g_s

    if not want_grad:
        out = call_sums(make_sums_kernel(sums), prep, extras, extra_specs)
        return jnp.sum(out[:, 0, 0])
    return call_dz(make_dz_kernel(grad), prep, kw, sem, g, extras,
                   extra_specs)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def upsampled_bacs_wce_sum(
    sem_logits: Array,
    labels: Array,
    max_seen: Array,
    out_hw: Tuple[int, int],
    old_classes: int,
    gamma: float,
    threshold: float,
    ukd: bool,
    ignore_index: int,
    interp: Optional[Tuple[float, float]],
) -> Array:
    """SUM of the BACS weighted CE terms of the bilinear-upsampled logits —
    the full-res logits never materialize.  `max_seen` [N, H, W]: per-pixel
    max seen-probability (already stop-gradded, full resolution).  The
    public mean op divides by the total pixel count (the reference's
    mean-over-ALL-pixels quirk)."""
    kh, kw = _kmats(sem_logits, out_hw, interp)
    if _use_pallas(sem_logits, out_hw) and ignore_index == 255:
        return _bacs_pallas(sem_logits, labels, max_seen, kh, kw, old_classes,
                            gamma, threshold, ukd, want_grad=False)
    return _bacs_wce_sum_jnp(sem_logits, labels, max_seen, kh, kw,
                             old_classes, gamma, threshold, ukd, ignore_index)


def _ubws_fwd(sem, labels, max_seen, out_hw, old_classes, gamma, threshold,
              ukd, ignore_index, interp):
    s = upsampled_bacs_wce_sum(
        sem, labels, max_seen, out_hw, old_classes, gamma, threshold, ukd,
        ignore_index, interp,
    )
    return s, (sem, labels, max_seen)


def _ubws_bwd(out_hw, old_classes, gamma, threshold, ukd, ignore_index,
              interp, res, g):
    sem, labels, max_seen = res
    kh, kw = _kmats(sem, out_hw, interp)
    if _use_pallas(sem, out_hw) and ignore_index == 255:
        dsem = _bacs_pallas(
            sem, labels, max_seen, kh, kw, old_classes, gamma, threshold,
            ukd, want_grad=True, g=g.astype(jnp.float32),
        )
        return dsem, None, None
    dsem = jax.grad(
        lambda s: _bacs_wce_sum_jnp(s, labels, max_seen, kh, kw, old_classes,
                                    gamma, threshold, ukd, ignore_index) * g
    )(sem)
    return dsem, None, None


upsampled_bacs_wce_sum.defvjp(_ubws_fwd, _ubws_bwd)


def upsampled_bacs_weighted_ce(
    sem_logits: Array,
    labels: Array,
    max_seen: Array,
    out_hw: Tuple[int, int],
    old_classes: int,
    gamma: float = 2.0,
    threshold: float = 0.5,
    ukd: bool = True,
    ignore_index: int = 255,
) -> Array:
    """BACS weighted CE, mean over ALL pixels (the reference quirk,
    loss_utils.py:523-588)."""
    s = upsampled_bacs_wce_sum(
        sem_logits, labels, max_seen, out_hw, old_classes, gamma, threshold,
        ukd, ignore_index, None,
    )
    n_tot = labels.shape[0] * labels.shape[1] * labels.shape[2]
    return s / n_tot


# ---------------------------------------------------------------------------
# MiB unbiased CE + unbiased KD (reference: training/loss_utils.py:447-520
# used by loss/mib.py): both terms consume FULL-RESOLUTION upsampled logits
# in the reference — at 512² b16 that is three ~0.35 GB tensors per step
# (new fwd for UCE, its bwd, old fwd for UKD).  These kernels fuse each
# term with the bilinear upsample so none of them materializes.
# ---------------------------------------------------------------------------


def _uce_sums_jnp(sem, labels, kh, kw, old_classes, ignore_index):
    from bacs_tpu.ops.losses import unbiased_cross_entropy

    up = _upsample_jnp(sem, kh, kw)
    nll = unbiased_cross_entropy(
        up, labels, old_classes, ignore_index, reduction="none"
    )
    mask = labels != ignore_index
    return jnp.sum(nll), jnp.sum(mask.astype(jnp.float32))


def _uce_terms(tile, labels, old_classes):
    """Per-block unbiased-CE loss/grad: old-class (and bg) targets score the
    COLLAPSED old-probability mass (= `_bacs_terms`' new-vs-rest term on its
    own; hand-derived composite softmax gradients)."""
    c_pad = tile.shape[1]
    m = jnp.max(tile, axis=1, keepdims=True)
    e = jnp.exp(tile - m)  # pad channels are -1e30 -> e == 0
    se = jnp.sum(e, axis=1, keepdims=True)
    p = e / se
    den = m[:, 0, :] + jnp.log(se[:, 0, :])

    valid, safe, ch, onehot = onehot_valid(labels, c_pad)
    is_old_ch = (ch < old_classes).astype(jnp.float32)

    eps = 1e-30
    e_old = e * is_old_ch
    se_old = jnp.sum(e_old, axis=1, keepdims=True)
    lse_old = m[:, 0, :] + jnp.log(se_old[:, 0, :] + eps)
    s_old = e_old / (se_old + eps)
    lab_logit = jnp.sum(onehot * tile, axis=1)

    is_old_pix = (safe < old_classes)
    l = jnp.where(is_old_pix, den - lse_old, den - lab_logit)
    g = jnp.where(is_old_pix[:, None, :], p - s_old, p - onehot)
    vm = valid.astype(jnp.float32)
    return l * vm, g * vm[:, None, :]


def _uce_pallas(sem, labels, kh, kw, old_classes, want_grad, g=None):
    prep = _prep_call(sem, labels, kh, kw)

    def sums(tile, labels_b):
        loss_map, _ = _uce_terms(tile, labels_b, old_classes)
        count = jnp.sum((labels_b != 255).astype(jnp.float32))
        return jnp.sum(loss_map), count

    def grad(tile, labels_b, g_s):
        _, gmap = _uce_terms(tile, labels_b, old_classes)
        return gmap * g_s

    if not want_grad:
        out = call_sums(make_sums_kernel(sums), prep)
        return jnp.sum(out[:, 0, 0]), jnp.sum(out[:, 0, 1])
    return call_dz(make_dz_kernel(grad), prep, kw, sem, g)


def _uce_sums(sem, labels, out_hw, old_classes, ignore_index, interp):
    kh, kw = _kmats(sem, out_hw, interp)
    if _use_pallas(sem, out_hw) and ignore_index == 255:
        return _uce_pallas(sem, labels, kh, kw, old_classes, want_grad=False)
    return _uce_sums_jnp(sem, labels, kh, kw, old_classes, ignore_index)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def upsampled_uce_sums(
    sem_logits: Array,
    labels: Array,
    out_hw: Tuple[int, int],
    old_classes: int,
    ignore_index: int,
    interp: Optional[Tuple[float, float]],
) -> Tuple[Array, Array]:
    """(Σ unbiased-CE(upsample(sem), labels) over valid pixels, valid count).

    MiB divides the sum by the TOTAL pixel count (its mean-over-ALL-pixels
    reduction quirk); the count output serves callers wanting a true mean."""
    return _uce_sums(sem_logits, labels, out_hw, old_classes, ignore_index,
                     interp)


def _uuce_fwd(sem, labels, out_hw, old_classes, ignore_index, interp):
    out = _uce_sums(sem, labels, out_hw, old_classes, ignore_index, interp)
    return out, (sem, labels)


def _uuce_bwd(out_hw, old_classes, ignore_index, interp, res, g):
    g_sum = g[0]  # the count output carries no sem gradient
    sem, labels = res
    kh, kw = _kmats(sem, out_hw, interp)
    if _use_pallas(sem, out_hw) and ignore_index == 255:
        dsem = _uce_pallas(sem, labels, kh, kw, old_classes, want_grad=True,
                           g=g_sum.astype(jnp.float32))
        return dsem, None
    dsem = jax.grad(
        lambda s: _uce_sums_jnp(s, labels, kh, kw, old_classes,
                                ignore_index)[0] * g_sum
    )(sem)
    return dsem, None


upsampled_uce_sums.defvjp(_uuce_fwd, _uuce_bwd)


def upsampled_unbiased_cross_entropy(
    sem_logits: Array,
    labels: Array,
    out_hw: Tuple[int, int],
    old_classes: int,
    ignore_index: int = 255,
) -> Array:
    """mean over VALID pixels of MiB's unbiased CE of the upsampled logits
    (ops/losses.unbiased_cross_entropy semantics)."""
    ls, ct = upsampled_uce_sums(
        sem_logits, labels, out_hw, old_classes, ignore_index, None
    )
    return ls / jnp.maximum(ct, 1.0)


def upsampled_argmax_nearest(
    sem: Array,
    out_hw: Tuple[int, int],
    down_hw: Tuple[int, int],
) -> Array:
    """`resize_nearest(argmax(bilinear_upsample(sem, out_hw)), down_hw)`
    without the full-res tensor: nearest picks src rows/cols
    floor(i·out/down), so only those rows of the interp matrices are
    evaluated (two tiny einsums).  Used by SDR's prototype distillation
    (reference: sdr.py:249-252 downsamples the full-res teacher argmax)."""
    kh, kw = _kmats(sem, out_hw)
    ys = np.clip(
        np.floor(np.arange(down_hw[0]) * (out_hw[0] / down_hw[0])
                 ).astype(np.int64), 0, out_hw[0] - 1,
    )
    xs = np.clip(
        np.floor(np.arange(down_hw[1]) * (out_hw[1] / down_hw[1])
                 ).astype(np.int64), 0, out_hw[1] - 1,
    )
    up = jnp.einsum("Hh,nhwc->nHwc", jnp.asarray(kh[ys]),
                    sem.astype(jnp.float32))
    up = jnp.einsum("Ww,nHwc->nHWc", jnp.asarray(kw[xs]), up)
    return jnp.argmax(up, axis=-1)


def _ukd_sum_jnp(sem_new, sem_old, kh, kw, alpha):
    from bacs_tpu.ops.losses import unbiased_knowledge_distillation

    up_n = _upsample_jnp(sem_new, kh, kw)
    up_o = _upsample_jnp(sem_old, kh, kw)
    n_tot = up_n.shape[0] * up_n.shape[1] * up_n.shape[2]
    # the op's primitive is the raw SUM T with loss = -T / n_tot
    return -unbiased_knowledge_distillation(up_n, up_o, alpha=alpha) * n_tot


def _ukd_terms(tile_new, tile_old, c_old, alpha):
    """Per-block UKD: T_pix = [q₀·lse_G + Σ_{1≤i<c_old} qᵢ·zᵢ − lse] / c_old
    with q = softmax(α·old), G = {bg} ∪ {new classes} (the student's bg+new
    mass matches the teacher's bg); dT/dz = [q₀·σ_G + q·1_old − p] / c_old.
    The teacher side is stop-gradient by KD semantics."""
    c_pad = tile_new.shape[1]
    ch = jax.lax.broadcasted_iota(jnp.int32, (1, c_pad, 1), 1)
    old_nb = ((ch >= 1) & (ch < c_old)).astype(jnp.float32)
    gmask = ((ch == 0) | (ch >= c_old)).astype(jnp.float32)

    to = tile_old * alpha
    mo = jnp.max(to, axis=1, keepdims=True)
    eo = jnp.exp(to - mo)  # pad channels are alpha·(-1e30) -> e == 0
    q = eo / jnp.sum(eo, axis=1, keepdims=True)
    # every [R, W]-rank quantity stays keepdims [R, 1, W]: Mosaic rejects
    # the relayout created by ARITHMETIC between sublane-reduced 2D vectors
    # here ("non-singleton dim replicated in destination"); broadcasting
    # [R,1,W] against [R,c,W] is the proven pattern of the other kernels
    q0 = jnp.sum(jnp.where(ch == 0, q, 0.0), axis=1, keepdims=True)

    m = jnp.max(tile_new, axis=1, keepdims=True)
    e = jnp.exp(tile_new - m)
    se = jnp.sum(e, axis=1, keepdims=True)
    p = e / se
    den = m + jnp.log(se)
    eps = 1e-30
    eg = e * gmask
    seg = jnp.sum(eg, axis=1, keepdims=True)
    lse_g = m + jnp.log(seg + eps)
    sg = eg / (seg + eps)

    sz = jnp.sum(q * old_nb * tile_new, axis=1, keepdims=True)
    t = (q0 * lse_g + sz - den) / c_old  # [R, 1, W]
    g = (q0 * sg + q * old_nb - p) / c_old
    return t, g


def _ukd_pallas(sem_new, sem_old, kh, kw, alpha, want_grad, g=None):
    prep = _prep_call_pair(sem_new, sem_old, kh, kw)
    c_old = sem_old.shape[-1]

    def sums(tn, to):
        t, _ = _ukd_terms(tn, to, c_old, alpha)
        return (jnp.sum(t),)

    def grad(tn, to, g_s):
        _, gmap = _ukd_terms(tn, to, c_old, alpha)
        return gmap * g_s

    if not want_grad:
        out = call_sums(make_pair_sums_kernel(sums), prep)
        return jnp.sum(out[:, 0, 0])
    return call_dz(make_pair_dz_kernel(grad), prep, kw, sem_new, g)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def upsampled_ukd_sum(
    sem_new: Array,
    sem_old: Array,
    out_hw: Tuple[int, int],
    alpha: float,
    interp: Optional[Tuple[float, float]],
) -> Array:
    """Raw SUM T of MiB's unbiased KD over the upsampled logit pair —
    loss = −T / n_pixels.  The teacher (`sem_old`) cotangent is hard zero
    (KD semantics: the reference detaches the old model's outputs)."""
    kh, kw = _kmats(sem_new, out_hw, interp)
    if _use_pallas(sem_new, out_hw):
        return _ukd_pallas(sem_new, sem_old, kh, kw, alpha, want_grad=False)
    return _ukd_sum_jnp(sem_new, sem_old, kh, kw, alpha)


def _uukd_fwd(sem_new, sem_old, out_hw, alpha, interp):
    t = upsampled_ukd_sum(sem_new, sem_old, out_hw, alpha, interp)
    return t, (sem_new, sem_old)


def _uukd_bwd(out_hw, alpha, interp, res, g):
    sem_new, sem_old = res
    kh, kw = _kmats(sem_new, out_hw, interp)
    if _use_pallas(sem_new, out_hw):
        dsem = _ukd_pallas(sem_new, sem_old, kh, kw, alpha, want_grad=True,
                           g=g.astype(jnp.float32))
        return dsem, jnp.zeros_like(sem_old)
    dsem = jax.grad(
        lambda s: _ukd_sum_jnp(s, sem_old, kh, kw, alpha) * g
    )(sem_new)
    return dsem, jnp.zeros_like(sem_old)


upsampled_ukd_sum.defvjp(_uukd_fwd, _uukd_bwd)


def upsampled_unbiased_kd(
    sem_new: Array,
    sem_old: Array,
    out_hw: Tuple[int, int],
    alpha: float = 1.0,
) -> Array:
    """MiB's unbiased KD of the bilinear-upsampled logit pair, mean over ALL
    pixels (ops/losses.unbiased_knowledge_distillation semantics) — neither
    full-res logit tensor materializes."""
    t = upsampled_ukd_sum(sem_new, sem_old, out_hw, alpha, None)
    n_tot = sem_new.shape[0] * out_hw[0] * out_hw[1]
    return -t / n_tot


# ---------------------------------------------------------------------------
# PLOP's full-res consumers (reference: loss/plop_loss.py:67-124 +
# torch CE on the upsampled logits):
#   1. per-IMAGE CE sums — PLOP's classif-adaptive factor is per-sample, so
#      mean(factor·nll) separates over the per-image sums the fwd kernel
#      already accumulates; the bwd takes a per-image cotangent vector.
#   2. pseudo-label generation — softmax/entropy/argmax of the upsampled OLD
#      logits (three full-res f32 tensors in the composed path) fused into
#      one kernel emitting only the int32 label map + per-image counts.
# ---------------------------------------------------------------------------


def _ce_sums_per_image_jnp(sem, labels, kh, kw, ignore_index):
    up = _upsample_jnp(sem, kh, kw)
    mask = labels != ignore_index
    safe = jnp.where(mask, labels, 0)
    lse = jax.nn.logsumexp(up, axis=-1)
    lab = jnp.take_along_axis(up, safe[..., None], axis=-1)[..., 0]
    loss = jnp.sum((lse - lab) * mask, axis=(1, 2))
    return loss, jnp.sum(mask, axis=(1, 2)).astype(jnp.float32)


def _ce_sums_per_image_pallas(sem, labels, kh, kw):
    out = call_sums(
        make_sums_kernel(_ce_tile_sums), _prep_call(sem, labels, kh, kw)
    )
    return out[:, 0, 0], out[:, 0, 1]


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def upsampled_ce_sums_per_image(
    sem_logits: Array,
    labels: Array,
    out_hw: Tuple[int, int],
    ignore_index: int,
    interp: Optional[Tuple[float, float]],
) -> Tuple[Array, Array]:
    """([N] per-image Σ CE over valid pixels, [N] valid counts)."""
    kh, kw = _kmats(sem_logits, out_hw, interp)
    if _use_pallas(sem_logits, out_hw) and ignore_index == 255:
        return _ce_sums_per_image_pallas(sem_logits, labels, kh, kw)
    return _ce_sums_per_image_jnp(sem_logits, labels, kh, kw, ignore_index)


def _ucespi_fwd(sem, labels, out_hw, ignore_index, interp):
    out = upsampled_ce_sums_per_image(sem, labels, out_hw, ignore_index,
                                      interp)
    return out, (sem, labels)


def _ucespi_bwd(out_hw, ignore_index, interp, res, g):
    gvec = g[0]  # [N]; the count output carries no sem gradient
    sem, labels = res
    kh, kw = _kmats(sem, out_hw, interp)
    if _use_pallas(sem, out_hw) and ignore_index == 255:
        dsem = _dsem_pallas(sem, labels, kh, kw, gvec.astype(jnp.float32),
                            per_image=True)
        return dsem, None
    up = _upsample_jnp(sem, kh, kw)
    mask = labels != ignore_index
    safe = jnp.where(mask, labels, 0)
    soft = jax.nn.softmax(up, axis=-1)
    onehot = jax.nn.one_hot(safe, sem.shape[-1])
    dup = (soft - onehot) * (mask * gvec[:, None, None])[..., None]
    dsem = jnp.einsum("Ww,nHWc->nHwc", jnp.asarray(kw), dup)
    dsem = jnp.einsum("Hh,nHwc->nhwc", jnp.asarray(kh), dsem).astype(sem.dtype)
    return dsem, None


upsampled_ce_sums_per_image.defvjp(_ucespi_fwd, _ucespi_bwd)


def _plop_pseudo_jnp(sem_old, labels, thresholds, kh, kw, max_entropy,
                     ignore_index):
    """Fallback = upsample + the golden plop._pseudo_labels math."""
    from bacs_tpu.ops.losses import pixel_entropy

    c_old = sem_old.shape[-1]
    up = _upsample_jnp(sem_old, kh, kw)
    probs = jax.nn.softmax(up, axis=-1)
    pseudo = jnp.argmax(probs, axis=-1).astype(labels.dtype)
    mask_bg = labels < c_old
    ent = pixel_entropy(probs) / max_entropy
    valid = ent < thresholds[pseudo]
    new_labels = jnp.where(~valid & mask_bg, ignore_index, labels)
    new_labels = jnp.where(valid & mask_bg, pseudo, new_labels)
    num = jnp.sum((valid & mask_bg).astype(jnp.float32), axis=(1, 2))
    den = jnp.sum(mask_bg.astype(jnp.float32), axis=(1, 2))
    return new_labels, num, den


def _pseudo_kernel(starts_ref, z_ref, labels_ref, kh_ref, thr_ref, me_ref,
                   lab_ref, sums_ref, *, hb, c_old):
    """Custom two-output kernel (int32 label map + per-image counts) — the
    one variant outside the sums/dz factories, built from the same tile
    helpers."""
    import jax.experimental.pallas as pl

    from bacs_tpu.ops.upsample_tiles import accum_scalars, read_tile

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        sums_ref[...] = jnp.zeros_like(sums_ref)

    _, _, tile = read_tile(starts_ref, z_ref, kh_ref, hb)
    labels = labels_ref[0]  # [R, W] int32
    c_pad = tile.shape[1]

    m = jnp.max(tile, axis=1, keepdims=True)
    e = jnp.exp(tile - m)  # pad channels are -1e30 -> p == 0
    p = e / jnp.sum(e, axis=1, keepdims=True)
    eps = 1e-8  # ops/losses._EPS
    # pixel_entropy = -(1/log(c+eps)) · MEAN over the c REAL channels
    # (pads contribute 0·log(eps) = 0 to the sum)
    import math as _math

    ent = jnp.sum(p * jnp.log(p + eps), axis=1, keepdims=True) * (
        -1.0 / (c_old * _math.log(c_old + eps))
    )
    ent = ent / me_ref[0, 0]  # [R, 1, W]

    pseudo = jnp.argmax(tile, axis=1).astype(jnp.int32)  # [R, W]
    ch = jax.lax.broadcasted_iota(jnp.int32, (1, c_pad, 1), 1)
    onehot = (ch == pseudo[:, None, :]).astype(jnp.float32)
    thrp = jnp.sum(onehot * thr_ref[0], axis=1, keepdims=True)  # [R, 1, W]
    valid = (ent < thrp)[:, 0, :]  # [R, W] bool

    mask_bg = labels < c_old
    new_labels = jnp.where(~valid & mask_bg, 255, labels)
    new_labels = jnp.where(valid & mask_bg, pseudo, new_labels)
    lab_ref[0] = new_labels

    num = jnp.sum((valid & mask_bg).astype(jnp.float32))
    den = jnp.sum(mask_bg.astype(jnp.float32))
    accum_scalars(sums_ref, num, den)


def _pseudo_pallas(sem_old, labels, thresholds, kh, kw, max_entropy):
    import jax.experimental.pallas as pl

    from bacs_tpu.ops.pallas_params import tpu_compiler_params
    from bacs_tpu.ops.upsample_tiles import (
        g_spec,
        labels_out_spec,
        sum_out_spec,
    )

    c_old = sem_old.shape[-1]
    lead, specs, dims = _prep_call(sem_old, labels, kh, kw)
    thr = _pad_w(thresholds[:c_old], dims["c_pad"])
    me = jnp.asarray(max_entropy, jnp.float32).reshape(1, 1)
    sums_shape, sums_spec = sum_out_spec(dims)
    lab_shape, lab_spec = labels_out_spec(dims)
    new_labels, sums = pl.pallas_call(
        partial(_pseudo_kernel, hb=dims["hb"], c_old=c_old),
        out_shape=(lab_shape, sums_shape),
        grid=dims["grid"],
        in_specs=specs + [_wvec_spec(dims), g_spec()],
        out_specs=(lab_spec, sums_spec),
        compiler_params=tpu_compiler_params(),
    )(*lead, thr, me)
    return new_labels, sums[:, 0, 0], sums[:, 0, 1]


def upsampled_plop_pseudo_labels(
    sem_old: Array,
    labels: Array,
    thresholds: Array,
    out_hw: Tuple[int, int],
    max_entropy: Array,
    ignore_index: int = 255,
    interp: Optional[Tuple[float, float]] = None,
) -> Tuple[Array, Array, Array]:
    """PLOP pseudo-labels from the upsampled OLD logits, fused: returns
    (new_labels [N,H,W] int32, num [N], den [N]) — `factor = num/max(den,1)`.
    Entirely stop-gradient (the teacher is detached); the composed path's
    full-res softmax/entropy/argmax tensors never materialize."""
    sem_old = jax.lax.stop_gradient(sem_old)
    kh, kw = _kmats(sem_old, out_hw, interp)
    if _use_pallas(sem_old, out_hw) and ignore_index == 255:
        return _pseudo_pallas(sem_old, labels, thresholds, kh, kw,
                              max_entropy)
    return _plop_pseudo_jnp(sem_old, labels, thresholds, kh, kw, max_entropy,
                            ignore_index)


# ---------------------------------------------------------------------------
# GSPMD spatial-partitioning composition: shard_map the kernels over a
# (data, space) mesh.  Each space shard owns H/S output rows; its input
# window needs exactly ONE neighbor row per side (8× bilinear upsample),
# exchanged via ppermute.  Shard-local interp matrices are uniform across
# shards because the shard size divides the upsample period; replicate-
# padding at the global edges equals the clamped global matrix exactly.
# ---------------------------------------------------------------------------


def spatial_shapes_ok(mesh, batch: int, out_h: int, sem_h: int) -> bool:
    """Whether (batch, label-H, sem-h) divide the (data, space) mesh — the
    precondition for the shard_map'ped kernel wrappers.  Callers fall back
    to the XLA-composed global path otherwise (e.g. small replay
    minibatches), which GSPMD partitions natively: identical math, unfused.
    """
    d, s = mesh.shape["data"], mesh.shape["space"]
    return batch % d == 0 and out_h % s == 0 and sem_h % s == 0


def _halo_pad(x: Array, axis_name: str, n_space: int) -> Array:
    """[n, h_loc, ...] → [n, h_loc+2, ...] with 1 neighbor row per side
    (replicated at the global top/bottom edges).  Differentiable: the
    ppermute transpose routes halo cotangents back to their owners."""
    first, last = x[:, :1], x[:, -1:]
    if n_space > 1:
        top = jax.lax.ppermute(
            last, axis_name, [(i, i + 1) for i in range(n_space - 1)]
        )
        bot = jax.lax.ppermute(
            first, axis_name, [(i + 1, i) for i in range(n_space - 1)]
        )
        idx = jax.lax.axis_index(axis_name)
        top = jnp.where(idx == 0, first, top)
        bot = jnp.where(idx == n_space - 1, last, bot)
    else:
        top, bot = first, last
    return jnp.concatenate([top, x, bot], axis=1)


def _spatial_spec(mesh, out_hw, sem_h):
    """(n_space, H_loc, interp) for the shard-local kernels."""
    n_space = mesh.shape["space"]
    H, _ = out_hw
    if H % n_space or sem_h % n_space:
        raise ValueError(f"{out_hw} / h={sem_h} not divisible by space={n_space}")
    H_loc = H // n_space
    # H_loc % ROW_BLOCK != 0 falls back to the per-shard jnp path via the
    # _use_pallas gate (still correct, just unfused) — the production 512²/8×
    # shapes are all multiples
    scale = sem_h / H
    return n_space, H_loc, (scale, 1.0)  # offset 1 = the top halo row


def spatial_upsampled_cross_entropy(
    sem_logits: Array,
    labels: Array,
    out_hw: Tuple[int, int],
    mesh,
    ignore_index: int = 255,
) -> Array:
    """`upsampled_cross_entropy` under a (data, space) GSPMD mesh: the
    Pallas kernels run per-shard on halo-padded local blocks; the mean's
    numerator/denominator are psum'd over the whole mesh, so the result is
    replicated (and bit-identical in structure to the single-chip op)."""
    n_space, H_loc, interp = _spatial_spec(mesh, out_hw, sem_logits.shape[1])

    def body(sem_l, labels_l):
        padded = _halo_pad(sem_l, "space", n_space)
        ls, ct = upsampled_ce_sums(
            padded, labels_l, (H_loc, out_hw[1]), ignore_index, interp
        )
        return (jax.lax.psum(ls, ("data", "space")),
                jax.lax.psum(ct, ("data", "space")))

    ls, ct = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("data", "space"), P("data", "space")),
        out_specs=(P(), P()),
        check_vma=False,
    )(sem_logits, labels)
    return ls / jnp.maximum(ct, 1.0)


def spatial_upsampled_weighted_cross_entropy(
    sem_logits: Array,
    labels: Array,
    class_weights: Array,
    out_hw: Tuple[int, int],
    mesh,
    ignore_index: int = 255,
) -> Array:
    n_space, H_loc, interp = _spatial_spec(mesh, out_hw, sem_logits.shape[1])

    def body(sem_l, labels_l, w):
        padded = _halo_pad(sem_l, "space", n_space)
        ls, ws = upsampled_wce_sums(
            padded, labels_l, w, (H_loc, out_hw[1]), ignore_index, interp
        )
        return (jax.lax.psum(ls, ("data", "space")),
                jax.lax.psum(ws, ("data", "space")))

    ls, ws = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("data", "space"), P("data", "space"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(sem_logits, labels, class_weights)
    return ls / jnp.maximum(ws, 1e-8)


def spatial_upsampled_bacs_weighted_ce(
    sem_logits: Array,
    labels: Array,
    max_seen: Array,
    out_hw: Tuple[int, int],
    mesh,
    old_classes: int,
    gamma: float = 2.0,
    threshold: float = 0.5,
    ukd: bool = True,
    ignore_index: int = 255,
) -> Array:
    n_space, H_loc, interp = _spatial_spec(mesh, out_hw, sem_logits.shape[1])

    def body(sem_l, labels_l, ms_l):
        padded = _halo_pad(sem_l, "space", n_space)
        s = upsampled_bacs_wce_sum(
            padded, labels_l, ms_l, (H_loc, out_hw[1]), old_classes, gamma,
            threshold, ukd, ignore_index, interp,
        )
        s = jax.lax.psum(s, ("data", "space"))
        n_loc = labels_l.shape[0] * labels_l.shape[1] * labels_l.shape[2]
        n_tot = jax.lax.psum(jnp.float32(n_loc), ("data", "space"))
        return s / n_tot

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("data", "space"), P("data", "space"), P("data", "space")),
        out_specs=P(),
        check_vma=False,
    )(sem_logits, labels, max_seen)


def spatial_upsampled_mib_ce(
    sem_logits: Array,
    labels: Array,
    out_hw: Tuple[int, int],
    mesh,
    old_classes: int,
    ignore_index: int = 255,
) -> Array:
    """MiB's CE term under a (data, space) mesh: unbiased CE when
    `old_classes > 0`, plain CE otherwise, mean over ALL pixels (the
    reference's reduction quirk — ignored pixels count in the denominator)."""
    n_space, H_loc, interp = _spatial_spec(mesh, out_hw, sem_logits.shape[1])

    def body(sem_l, labels_l):
        padded = _halo_pad(sem_l, "space", n_space)
        if old_classes:
            ls, _ = upsampled_uce_sums(
                padded, labels_l, (H_loc, out_hw[1]), old_classes,
                ignore_index, interp,
            )
        else:
            ls, _ = upsampled_ce_sums(
                padded, labels_l, (H_loc, out_hw[1]), ignore_index, interp
            )
        ls = jax.lax.psum(ls, ("data", "space"))
        n_loc = labels_l.shape[0] * labels_l.shape[1] * labels_l.shape[2]
        n_tot = jax.lax.psum(jnp.float32(n_loc), ("data", "space"))
        return ls / n_tot

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("data", "space"), P("data", "space")),
        out_specs=P(),
        check_vma=False,
    )(sem_logits, labels)


def spatial_upsampled_unbiased_cross_entropy(
    sem_logits: Array,
    labels: Array,
    out_hw: Tuple[int, int],
    mesh,
    old_classes: int,
    ignore_index: int = 255,
) -> Array:
    """`upsampled_unbiased_cross_entropy` (mean over VALID pixels — SDR's
    reduction, unlike MiB's mean-over-all) under a (data, space) mesh."""
    n_space, H_loc, interp = _spatial_spec(mesh, out_hw, sem_logits.shape[1])

    def body(sem_l, labels_l):
        padded = _halo_pad(sem_l, "space", n_space)
        ls, ct = upsampled_uce_sums(
            padded, labels_l, (H_loc, out_hw[1]), old_classes, ignore_index,
            interp,
        )
        return (jax.lax.psum(ls, ("data", "space")),
                jax.lax.psum(ct, ("data", "space")))

    ls, ct = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("data", "space"), P("data", "space")),
        out_specs=(P(), P()),
        check_vma=False,
    )(sem_logits, labels)
    return ls / jnp.maximum(ct, 1.0)


def spatial_plop_pseudo_ce(
    sem_new: Array,
    sem_old: Array,
    labels: Array,
    thresholds: Array,
    max_entropy: Array,
    out_hw: Tuple[int, int],
    mesh,
    ignore_index: int = 255,
) -> Array:
    """PLOP's pseudo-label CE term under a (data, space) mesh: per-shard
    fused pseudo-labels + per-image CE sums; the per-image counts/sums psum
    over the space axis (each image's rows are split across it), the final
    scalar over the whole mesh.  Equals
    mean_over_ALL_pixels(factor_n · nll) of the global op exactly."""
    n_space, H_loc, interp = _spatial_spec(mesh, out_hw, sem_new.shape[1])

    def body(sn, so, labels_l):
        po = _halo_pad(so, "space", n_space)
        pseudo, num, den = upsampled_plop_pseudo_labels(
            po, labels_l, thresholds, (H_loc, out_hw[1]), max_entropy,
            ignore_index, interp,
        )
        num = jax.lax.psum(num, "space")
        den = jax.lax.psum(den, "space")
        factor = jnp.clip(num / jnp.maximum(den, 1.0), 0.0, None)
        pn = _halo_pad(sn, "space", n_space)
        ls, _ = upsampled_ce_sums_per_image(
            pn, pseudo, (H_loc, out_hw[1]), ignore_index, interp
        )
        ls = jax.lax.psum(ls, "space")
        # every space shard now holds identical per-image vectors; sum the
        # factor-weighted sums over the data axis only (a space psum would
        # double-count) and normalize by the GLOBAL pixel count
        tot = jax.lax.psum(jnp.sum(factor * ls), "data")
        n_loc = labels_l.shape[0] * labels_l.shape[1] * labels_l.shape[2]
        n_tot = jax.lax.psum(jnp.float32(n_loc), ("data", "space"))
        return tot / n_tot

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("data", "space"), P("data", "space"), P("data", "space")),
        out_specs=P(),
        check_vma=False,
    )(sem_new, sem_old, labels)


def spatial_upsampled_unbiased_kd(
    sem_new: Array,
    sem_old: Array,
    out_hw: Tuple[int, int],
    mesh,
    alpha: float = 1.0,
) -> Array:
    """`upsampled_unbiased_kd` under a (data, space) mesh (both logit pairs
    sharded identically; the teacher's halo rows ride the same ppermute)."""
    n_space, H_loc, interp = _spatial_spec(mesh, out_hw, sem_new.shape[1])

    def body(sn, so):
        pn = _halo_pad(sn, "space", n_space)
        po = _halo_pad(so, "space", n_space)
        t = upsampled_ukd_sum(pn, po, (H_loc, out_hw[1]), alpha, interp)
        t = jax.lax.psum(t, ("data", "space"))
        n_loc = sn.shape[0] * H_loc * out_hw[1]
        n_tot = jax.lax.psum(jnp.float32(n_loc), ("data", "space"))
        return -t / n_tot

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("data", "space"), P("data", "space")),
        out_specs=P(),
        check_vma=False,
    )(sem_new, sem_old)
