"""Fused bilinear-upsample + cross-entropy: the full-res logits never exist.

The reference (and any naive port) materializes [N, 512, 512, C] float32
logits for the loss (reference: networks/deeplab_v3.py:158-160 upsample →
F.cross_entropy).  The optimized-HLO audit of our train step showed ~30
tensors of that shape (0.35 GB each at batch 16) — upsample, log-softmax,
one-hot gather and their transposes — making the step HBM-bound at 83 GB of
traffic.

This op computes  CE(bilinear_upsample(sem_logits), labels)  without ever
materializing the upsampled logits:

    forward:  per output-row block, interpolate a [R, W, C] tile in VMEM from
              the (tiny) sem-logits via two small matmuls, log-sum-exp over
              C, gather the label logit, accumulate (loss_sum, valid_count).
    backward: d sem = Upᵀ(softmax − onehot), the transpose interpolation
              accumulated straight into the per-sample output block.

Bilinear weights are separable: Up = K_H ⊗ K_W with each K row holding two
half-pixel-center weights, so interpolation rides the MXU.

Semantics match ops/interpolate.resize_bilinear(align_corners=False) +
ops/losses.cross_entropy (mean over non-ignore pixels) exactly; a jnp
reference path backs non-TPU platforms and the unit tests.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

NEG = -1e30
ROW_BLOCK = 16  # output rows per grid step


def _interp_matrix(out_dim: int, in_dim: int) -> np.ndarray:
    """[out, in] bilinear matrix with half-pixel centers (align_corners=False)."""
    k = np.zeros((out_dim, in_dim), np.float32)
    if out_dim == in_dim:
        np.fill_diagonal(k, 1.0)
        return k
    coords = np.clip(
        (np.arange(out_dim) + 0.5) * in_dim / out_dim - 0.5, 0, in_dim - 1
    )
    lo = np.clip(np.floor(coords).astype(np.int64), 0, in_dim - 1)
    hi = np.clip(lo + 1, 0, in_dim - 1)
    w = (coords - lo).astype(np.float32)
    k[np.arange(out_dim), lo] += 1.0 - w
    k[np.arange(out_dim), hi] += w
    return k


# ---------------------------------------------------------------------------
# jnp reference implementation (and non-TPU fallback)
# ---------------------------------------------------------------------------


def _ce_sums_jnp(sem, labels, kh, kw, ignore_index):
    up = jnp.einsum("Hh,nhwc->nHwc", kh, sem.astype(jnp.float32))
    up = jnp.einsum("Ww,nHwc->nHWc", kw, up)
    mask = labels != ignore_index
    safe = jnp.where(mask, labels, 0)
    lse = jax.nn.logsumexp(up, axis=-1)
    lab = jnp.take_along_axis(up, safe[..., None], axis=-1)[..., 0]
    loss_sum = jnp.sum((lse - lab) * mask)
    return loss_sum, jnp.sum(mask)


# ---------------------------------------------------------------------------
# Pallas TPU kernels
# ---------------------------------------------------------------------------


def _interp_tile(sem_ref, kh_ref, kw_ref):
    """[R, W, C] interpolated tile via two small matmuls (MXU)."""
    sem = sem_ref[0].astype(jnp.float32)  # [h, w, C]
    ky = kh_ref[...]  # [R, h]
    t1 = jnp.einsum("Rh,hwc->Rwc", ky, sem, preferred_element_type=jnp.float32)
    return jnp.einsum(
        "Ww,Rwc->RWc", kw_ref[...], t1, preferred_element_type=jnp.float32
    )


def _fwd_kernel(sem_ref, labels_ref, kh_ref, kw_ref, out_ref, *, c_real):
    """grid = (N, H // ROW_BLOCK); out_ref: [N, 8, 128] — (loss_sum, count)
    live at [n, 0, 0] / [n, 0, 1], the rest pads the min TPU tile."""
    import jax.experimental.pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    tile = _interp_tile(sem_ref, kh_ref, kw_ref)  # [R, W, C]
    labels = labels_ref[0]  # [R, W]
    c_pad = tile.shape[-1]
    ch = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c_pad), 2)
    cmask = ch < c_real
    masked = jnp.where(cmask, tile, NEG)
    m = jnp.max(masked, axis=-1)
    sumexp = jnp.sum(jnp.where(cmask, jnp.exp(masked - m[..., None]), 0.0), -1)
    lse = m + jnp.log(sumexp)
    valid = labels != 255
    safe = jnp.where(valid, labels, 0)
    onehot = ch == safe[..., None]
    lab = jnp.sum(jnp.where(onehot, tile, 0.0), axis=-1)
    loss_sum = jnp.sum(jnp.where(valid, lse - lab, 0.0))
    count = jnp.sum(valid.astype(jnp.float32))
    # scalar stores to VMEM are not lowerable — write a masked [8,128] tile
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    upd = jnp.where((row == 0) & (col == 0), loss_sum, 0.0) + jnp.where(
        (row == 0) & (col == 1), count, 0.0
    )
    out_ref[0] += upd


def _bwd_kernel(sem_ref, labels_ref, kh_ref, kw_ref, g_ref, dsem_ref, *, c_real):
    import jax.experimental.pallas as pl

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dsem_ref[...] = jnp.zeros_like(dsem_ref)

    tile = _interp_tile(sem_ref, kh_ref, kw_ref)
    labels = labels_ref[0]
    c_pad = tile.shape[-1]
    ch = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c_pad), 2)
    cmask = ch < c_real
    masked = jnp.where(cmask, tile, NEG)
    m = jnp.max(masked, axis=-1, keepdims=True)
    e = jnp.where(cmask, jnp.exp(masked - m), 0.0)
    softmax = e / jnp.sum(e, axis=-1, keepdims=True)
    valid = labels != 255
    safe = jnp.where(valid, labels, 0)
    onehot = (ch == safe[..., None]).astype(jnp.float32)
    g = g_ref[0, 0]
    dtile = (softmax - onehot) * (valid.astype(jnp.float32) * g)[..., None]
    # transpose-interp: dsem += K_Hᵀ (K_Wᵀ dtile)
    dt1 = jnp.einsum(
        "Ww,RWc->Rwc", kw_ref[...], dtile, preferred_element_type=jnp.float32
    )
    ky = kh_ref[...]
    dsem_ref[0] += jnp.einsum(
        "Rh,Rwc->hwc", ky, dt1, preferred_element_type=jnp.float32
    ).astype(dsem_ref.dtype)


def _pad_c(x, mult=128):
    c = x.shape[-1]
    pad = (-c) % mult
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return x


def _ce_sums_pallas(sem, labels, kh, kw, c_real):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, _ = sem.shape
    H, W = kh.shape[0], kw.shape[0]
    sem_p = _pad_c(sem)
    c_pad = sem_p.shape[-1]
    n_blocks = H // ROW_BLOCK
    out = pl.pallas_call(
        partial(_fwd_kernel, c_real=c_real),
        out_shape=jax.ShapeDtypeStruct((n, 8, 128), jnp.float32),
        grid=(n, n_blocks),
        in_specs=[
            pl.BlockSpec((1, h, w, c_pad), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROW_BLOCK, W), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_BLOCK, h), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, w), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(sem_p, labels.astype(jnp.int32), kh, kw)
    return jnp.sum(out[:, 0, 0]), jnp.sum(out[:, 0, 1])


def _dsem_pallas(sem, labels, kh, kw, c_real, g):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, _ = sem.shape
    H, W = kh.shape[0], kw.shape[0]
    sem_p = _pad_c(sem)
    c_pad = sem_p.shape[-1]
    n_blocks = H // ROW_BLOCK
    dsem_p = pl.pallas_call(
        partial(_bwd_kernel, c_real=c_real),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c_pad), sem.dtype),
        grid=(n, n_blocks),
        in_specs=[
            pl.BlockSpec((1, h, w, c_pad), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROW_BLOCK, W), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROW_BLOCK, h), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, w), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c_pad), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )(sem_p, labels.astype(jnp.int32), kh, kw, g.reshape(1, 1))
    return dsem_p[..., : sem.shape[-1]]


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


def _use_pallas(sem, out_hw) -> bool:
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:  # pragma: no cover
        return False
    h = sem.shape[1]
    return out_hw[0] % ROW_BLOCK == 0 and out_hw[0] >= h and out_hw[1] >= sem.shape[2]


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def upsampled_cross_entropy(
    sem_logits: Array,
    labels: Array,
    out_hw: Tuple[int, int],
    ignore_index: int = 255,
) -> Array:
    """mean CE(bilinear_upsample(sem_logits, out_hw), labels)."""
    loss_sum, count = _ce_sums(sem_logits, labels, out_hw, ignore_index)
    return loss_sum / jnp.maximum(count, 1.0)


def _kmats(sem, out_hw):
    kh = jnp.asarray(_interp_matrix(out_hw[0], sem.shape[1]))
    kw = jnp.asarray(_interp_matrix(out_hw[1], sem.shape[2]))
    return kh, kw


def _ce_sums(sem, labels, out_hw, ignore_index):
    kh, kw = _kmats(sem, out_hw)
    if _use_pallas(sem, out_hw) and ignore_index == 255:
        return _ce_sums_pallas(sem, labels, kh, kw, sem.shape[-1])
    return _ce_sums_jnp(sem, labels, kh, kw, ignore_index)


def _uce_fwd(sem, labels, out_hw, ignore_index):
    loss_sum, count = _ce_sums(sem, labels, out_hw, ignore_index)
    return loss_sum / jnp.maximum(count, 1.0), (sem, labels, count)


def _uce_bwd(out_hw, ignore_index, res, g):
    sem, labels, count = res
    kh, kw = _kmats(sem, out_hw)
    gn = g / jnp.maximum(count, 1.0)
    if _use_pallas(sem, out_hw) and ignore_index == 255:
        dsem = _dsem_pallas(
            sem, labels, kh, kw, sem.shape[-1], gn.astype(jnp.float32)
        )
        return dsem, None
    # jnp fallback backward
    up = jnp.einsum("Hh,nhwc->nHwc", kh, sem.astype(jnp.float32))
    up = jnp.einsum("Ww,nHwc->nHWc", kw, up)
    mask = labels != ignore_index
    safe = jnp.where(mask, labels, 0)
    soft = jax.nn.softmax(up, axis=-1)
    onehot = jax.nn.one_hot(safe, sem.shape[-1])
    dup = (soft - onehot) * mask[..., None] * gn
    dsem = jnp.einsum("Ww,nHWc->nHwc", kw, dup)
    dsem = jnp.einsum("Hh,nHwc->nhwc", kh, dsem).astype(sem.dtype)
    return dsem, None


upsampled_cross_entropy.defvjp(_uce_fwd, _uce_bwd)
