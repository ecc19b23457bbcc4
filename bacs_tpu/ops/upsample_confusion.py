"""Fused bilinear-upsample + argmax + confusion-matrix accumulation.

Evaluation's twin of ops/upsample_ce.py: the confusion matrix is computed
tile-by-tile in VMEM directly from os-16 sem-logits — the full-resolution
logits and the [N, H, W] prediction map never reach HBM.  Per tile, the
interpolated [R, W, C] logits argmax into predictions, and the update is a
one-hotᵀ·one-hot matmul accumulated into a single [C_pad, C_pad] output
block revisited by every grid step.

jnp fallback keeps CPU/tests exact; semantics match
argmax(resize_bilinear(sem)) + ops/confusion.confusion_matrix.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from bacs_tpu.ops.confusion import confusion_matrix
from bacs_tpu.ops.interpolate import resize_bilinear
from bacs_tpu.ops.upsample_ce import _interp_matrix

Array = jax.Array

NEG = -1e30
ROW_BLOCK = 16  # output rows per grid step (this kernel's channels-on-lanes tiling)


def _pad_c(x: Array, mult: int = 128) -> Array:
    c = x.shape[-1]
    pad = (-c) % mult
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return x


def _interp_tile(sem_ref, kh_ref, kw_ref):
    """[R, W, C] interpolated tile via two small matmuls (MXU)."""
    sem = sem_ref[0].astype(jnp.float32)  # [h, w, C]
    ky = kh_ref[...]  # [R, h]
    t1 = jnp.einsum("Rh,hwc->Rwc", ky, sem, preferred_element_type=jnp.float32)
    return jnp.einsum(
        "Ww,Rwc->RWc", kw_ref[...], t1, preferred_element_type=jnp.float32
    )


def _conf_jnp(sem, labels, out_hw, num_classes, ignore_index):
    up = resize_bilinear(sem.astype(jnp.float32), out_hw, align_corners=False)
    preds = jnp.argmax(up, axis=-1)
    return confusion_matrix(preds, labels, num_classes, ignore_index)


def _conf_kernel(sem_ref, labels_ref, kh_ref, kw_ref, out_ref, *, c_real, n_cls):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    tile = _interp_tile(sem_ref, kh_ref, kw_ref)  # [R, W, C_pad] f32
    labels = labels_ref[0]  # [R, W]
    r, w, c_pad = tile.shape
    ch = jax.lax.broadcasted_iota(jnp.int32, (1, 1, c_pad), 2)
    masked = jnp.where(ch < c_real, tile, NEG)
    preds = jnp.argmax(masked, axis=-1)  # [R, W]
    valid = (labels >= 0) & (labels < n_cls)
    safe_t = jnp.where(valid, labels, 0)
    # one-hot contraction: conf += onehot(target)ᵀ · onehot(pred)
    ch3 = jax.lax.broadcasted_iota(jnp.int32, (r, w, c_pad), 2)
    # NB minor-dim insertion of 1-bit vectors is not lowerable — broadcast
    # the validity mask as f32 instead of AND-ing bools
    oh_t = (
        (ch3 == safe_t[..., None]).astype(jnp.float32)
        * valid.astype(jnp.float32)[..., None]
    ).reshape(r * w, c_pad)
    oh_p = (ch3 == preds[..., None]).astype(jnp.float32).reshape(r * w, c_pad)
    out_ref[...] += jax.lax.dot_general(
        oh_t,
        oh_p,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _conf_pallas(sem, labels, kh, kw, c_real, num_classes):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, _ = sem.shape
    H, W = kh.shape[0], kw.shape[0]
    sem_p = _pad_c(sem)
    c_pad = sem_p.shape[-1]
    n_blocks = H // ROW_BLOCK
    out = pl.pallas_call(
        partial(_conf_kernel, c_real=c_real, n_cls=num_classes),
        out_shape=jax.ShapeDtypeStruct((c_pad, c_pad), jnp.float32),
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
        out_specs=pl.BlockSpec((c_pad, c_pad), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
    )(sem_p, labels.astype(jnp.int32), kh, kw)
    return out[:num_classes, :num_classes].astype(jnp.int32)


def _use_pallas(sem, out_hw) -> bool:
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:  # pragma: no cover
        return False
    return (
        out_hw[0] % ROW_BLOCK == 0
        and out_hw[0] >= sem.shape[1]
        and out_hw[1] >= sem.shape[2]
    )


def upsampled_confusion(
    sem_logits: Array,
    labels: Array,
    out_hw: Tuple[int, int],
    num_classes: int,
    ignore_index: int = 255,
) -> Array:
    """[num_classes, num_classes] confusion of argmax(upsample(sem_logits)).

    `sem_logits` should already be sliced to the active classes; rows/cols
    beyond them stay zero.
    """
    if _use_pallas(sem_logits, out_hw):
        kh = jnp.asarray(_interp_matrix(out_hw[0], sem_logits.shape[1]))
        kw = jnp.asarray(_interp_matrix(out_hw[1], sem_logits.shape[2]))
        c_active = sem_logits.shape[-1]
        conf = _conf_pallas(sem_logits, labels, kh, kw, c_active, num_classes)
        return conf
    return _conf_jnp(sem_logits, labels, out_hw, num_classes, ignore_index)
