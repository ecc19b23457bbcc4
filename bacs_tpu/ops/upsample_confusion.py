"""Fused bilinear-upsample + argmax + confusion-matrix accumulation.

Evaluation's twin of ops/upsample_ce.py: the confusion matrix is computed
tile-by-tile in VMEM directly from os-16 sem-logits — the full-resolution
logits and the [N, H, W] prediction map never reach HBM.

Same decomposition as the v2 CE kernel: W-interp hoisted outside (one XLA
einsum on the small h side, channels −1e30-padded), block-local H-interp
windows, interpolation + argmax over [R, c, W] tiles with channels on
SUBLANES.  Only the one-hotᵀ·one-hot confusion contraction uses a
channels-on-lanes [R·W, C_pad] layout (two compares + one MXU matmul).

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
from bacs_tpu.ops.pallas_params import tpu_compiler_params
from bacs_tpu.ops.upsample_ce import (
    ROW_BLOCK,
    _block_kh,
    _kmats,
    _w_interp,
)

Array = jax.Array

NEG = -1e30


def _conf_jnp(sem, labels, out_hw, num_classes, ignore_index):
    up = resize_bilinear(sem.astype(jnp.float32), out_hw, align_corners=False)
    preds = jnp.argmax(up, axis=-1)
    return confusion_matrix(preds, labels, num_classes, ignore_index)


def _conf_kernel(
    starts_ref, z_ref, labels_ref, kh_ref, out_ref, *, hb, c_real, n_cls
):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    start = starts_ref[j]
    zs = z_ref[0, pl.ds(start, hb)]  # [hb, c, W]
    ky = kh_ref[0]  # [R, hb]
    tile = jnp.einsum("Rh,hcW->RcW", ky, zs, preferred_element_type=jnp.float32)
    labels = labels_ref[0]  # [R, W]
    # argmax over the (sublane) channel dim; padded channels are −1e30
    preds = jnp.argmax(tile, axis=1).astype(jnp.int32)  # [R, W]
    valid = (labels >= 0) & (labels < n_cls)
    safe_t = jnp.where(valid, labels, 0)
    r, w = labels.shape
    c_pad = out_ref.shape[-1]
    # one-hot contraction: conf += onehot(target)ᵀ · onehot(pred)
    # bf16 one-hots: exact (0/1 values, per-block counts < 2^8 per MXU pass)
    # and the matmul runs at native bf16 MXU rate
    ch3 = jax.lax.broadcasted_iota(jnp.int32, (r, w, c_pad), 2)
    # NB minor-dim insertion is only lowerable for 32-bit types — broadcast
    # the validity mask as f32, then drop to bf16 for the MXU
    oh_t = (
        (ch3 == safe_t[..., None]).astype(jnp.float32)
        * valid.astype(jnp.float32)[..., None]
    ).astype(jnp.bfloat16).reshape(r * w, c_pad)
    oh_p = (ch3 == preds[..., None]).astype(jnp.bfloat16).reshape(r * w, c_pad)
    out_ref[...] += jax.lax.dot_general(
        oh_t,
        oh_p,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _conf_pallas(sem, labels, kh, kw, c_real, num_classes):
    """kh/kw are dense NUMPY interp matrices (possibly shard-local)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, _ = sem.shape
    H, W = kh.shape[0], kw.shape[0]
    z = _w_interp(sem, kw)  # [n, h, c, W], −1e30 channel padding
    c_pad = z.shape[2]
    starts, kh_blocks = _block_kh(kh, ROW_BLOCK)
    hb = kh_blocks.shape[2]
    c_out = max(128, -(-num_classes // 128) * 128)
    out = pl.pallas_call(
        partial(_conf_kernel, hb=hb, c_real=c_real, n_cls=num_classes),
        out_shape=jax.ShapeDtypeStruct((c_out, c_out), jnp.float32),
        grid=(n, H // ROW_BLOCK),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, c_pad, W), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROW_BLOCK, W), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROW_BLOCK, hb), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c_out, c_out), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=tpu_compiler_params(),
    )(starts, z, labels.astype(jnp.int32), kh_blocks)
    return out[:num_classes, :num_classes].astype(jnp.int32)


def _use_pallas(sem, out_hw) -> bool:
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:  # pragma: no cover
        return False
    return (
        out_hw[0] % ROW_BLOCK == 0
        and out_hw[1] % 128 == 0  # lane dim (see upsample_ce._use_pallas)
        and out_hw[0] >= sem.shape[1]
        and out_hw[1] >= sem.shape[2]
    )


def upsampled_confusion(
    sem_logits: Array,
    labels: Array,
    out_hw: Tuple[int, int],
    num_classes: int,
    ignore_index: int = 255,
    interp=None,
) -> Array:
    """[num_classes, num_classes] confusion of argmax(upsample(sem_logits)).

    `sem_logits` should already be sliced to the active classes; rows/cols
    beyond them stay zero.  `interp=(scale, offset)` selects a shard-local
    H window (the spatial-partitioning path).
    """
    kh, kw = _kmats(sem_logits, out_hw, interp)
    if _use_pallas(sem_logits, out_hw):
        c_active = sem_logits.shape[-1]
        return _conf_pallas(sem_logits, labels, kh, kw, c_active, num_classes)
    if interp is None:
        return _conf_jnp(sem_logits, labels, out_hw, num_classes, ignore_index)
    up = jnp.einsum("Hh,nhwc->nHwc", jnp.asarray(kh),
                    sem_logits.astype(jnp.float32))
    up = jnp.einsum("Ww,nHwc->nHWc", jnp.asarray(kw), up)
    preds = jnp.argmax(up, axis=-1)
    return confusion_matrix(preds, labels, num_classes, ignore_index)


def spatial_upsampled_confusion(
    sem_logits: Array,
    labels: Array,
    out_hw: Tuple[int, int],
    mesh,
    num_classes: int,
    ignore_index: int = 255,
) -> Array:
    """`upsampled_confusion` under a (data, space) GSPMD mesh: per-shard
    kernels on halo-padded blocks, partial matrices psum'd over the mesh
    (same composition as ops/upsample_ce.spatial_* wrappers)."""
    from jax.sharding import PartitionSpec as P

    from bacs_tpu.ops.upsample_ce import _halo_pad, _spatial_spec

    n_space, H_loc, interp = _spatial_spec(mesh, out_hw, sem_logits.shape[1])

    def body(sem_l, labels_l):
        padded = _halo_pad(sem_l, "space", n_space)
        cm = upsampled_confusion(
            padded, labels_l, (H_loc, out_hw[1]), num_classes, ignore_index,
            interp,
        )
        return jax.lax.psum(cm, ("data", "space"))

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("data", "space"), P("data", "space")),
        out_specs=P(),
        check_vma=False,
    )(sem_logits, labels)
