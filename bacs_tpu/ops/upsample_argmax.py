"""Fused bilinear-upsample + argmax + max-softmax-confidence (serving).

Serving twin of ops/upsample_confusion.py, feeding the Predictor's
(mask, confidence) payload from the pre-upsample sem-logits so the
[N, H, W, C] full-resolution logits never materialize in the graph.
Forward-only (no VJP): serving never differentiates.

Measured (v5e, DeepLab-RN101 512² b16 batch 16, predictor forward):

- XLA-composed jax.image.resize→softmax→argmax tail: 13.1 ms of a 32.0 ms
  forward — the 21-class channel dim rides 128 lanes at ~6× waste through
  the gather-based resize.
- THIS default path (einsum-matrix resize in bf16 — two MXU matmuls —
  then argmax + 1/Σexp conf): tail 4.0 ms, forward 22.8 ms (1.4×,
  ~700 img/s device-side).
- The Pallas tile kernel (same decomposition as the CE kernels): 6-11 ms
  ISOLATED, 30.3 ms in-forward — SLOWER than the einsum path.  A
  write-only kernel still costs 5.95 ms, i.e. the cost is the
  2×[N,H,W] output-block DMA structure (256 small per-step stores), not
  compute; a fori_loop single-DMA-per-image restructure measured 15.9 ms.
  Kept behind `use_pallas=True` for other topologies, OFF by default
  (same policy as the measured-off ops/stem_pool.py).

Numerics note: on TPU the interp matmuls run at bf16 MXU precision in
BOTH paths (XLA einsum and the kernel's in-tile einsum) — vs an f64
reference ~0.3% of pixels flip argmax, all at decision boundaries where
the top-2 logits are within ~0.02; confidence differs ≤2e-2.  The CPU
fallback is exact f32.

Reference analogue: the reference has no serving path at all; this
accelerates the deployment story bacs_tpu adds on top
(serve.py Predictor).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from bacs_tpu.ops.pallas_params import tpu_compiler_params
from bacs_tpu.ops.upsample_ce import (
    ROW_BLOCK,
    _block_kh,
    _kmats,
    _w_interp,
)

Array = jax.Array


def _argmax_conf_from(up: Array) -> Tuple[Array, Array]:
    """argmax + max softmax prob from full-res f32 logits [n,H,W,c]."""
    preds = jnp.argmax(up, axis=-1).astype(jnp.uint8)
    m = jnp.max(up, axis=-1)
    denom = jnp.sum(jnp.exp(up - m[..., None]), axis=-1)
    return preds, (1.0 / denom).astype(jnp.float16)


def _argmax_conf_jnp(sem: Array, kh, kw) -> Tuple[Array, Array]:
    """Einsum-matrix resize fallback (bf16 interp matmuls ride the MXU;
    measured 9 ms cheaper in-forward than the gather-based
    jax.image.resize composition at 512² b16)."""
    up = jnp.einsum("Hh,nhwc->nHwc", jnp.asarray(kh, sem.dtype), sem)
    up = jnp.einsum("Ww,nHwc->nHWc", jnp.asarray(kw, sem.dtype), up)
    return _argmax_conf_from(up.astype(jnp.float32))


def _kernel(starts_ref, z_ref, kh_ref, pred_ref, conf_ref, *, hb):
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    start = starts_ref[j]
    zs = z_ref[0, pl.ds(start, hb)]  # [hb, c, W]
    ky = kh_ref[0]  # [R, hb]
    tile = jnp.einsum(
        "Rh,hcW->RcW", ky, zs, preferred_element_type=jnp.float32
    )
    # channels ride sublanes; −1e30 padding loses every argmax and adds
    # exp()=0 to the denominator — no channel masks anywhere
    pred_ref[0] = jnp.argmax(tile, axis=1).astype(jnp.int32)  # [R, W]
    m = jnp.max(tile, axis=1)
    conf_ref[0] = 1.0 / jnp.sum(jnp.exp(tile - m[:, None, :]), axis=1)


def _argmax_conf_pallas(sem: Array, kh, kw) -> Tuple[Array, Array]:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, _ = sem.shape
    H, W = kh.shape[0], kw.shape[0]
    z = _w_interp(sem, kw)  # [n, h, c_pad, W] f32, −1e30 channel padding
    c_pad = z.shape[2]
    starts, kh_blocks = _block_kh(kh, ROW_BLOCK)
    hb = kh_blocks.shape[2]
    preds, conf = pl.pallas_call(
        partial(_kernel, hb=hb),
        out_shape=(
            jax.ShapeDtypeStruct((n, H, W), jnp.int32),
            jax.ShapeDtypeStruct((n, H, W), jnp.float32),
        ),
        grid=(n, H // ROW_BLOCK),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, c_pad, W), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROW_BLOCK, hb), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, ROW_BLOCK, W), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROW_BLOCK, W), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=tpu_compiler_params(),
    )(starts, z, kh_blocks)
    return preds.astype(jnp.uint8), conf.astype(jnp.float16)


def _pallas_ok(sem, out_hw) -> bool:
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


def upsampled_argmax_conf(
    sem_logits: Array,
    out_hw: Tuple[int, int],
    use_pallas: bool = False,
) -> Tuple[Array, Array]:
    """(pred uint8 [n,H,W], max-softmax-confidence f16 [n,H,W]) of
    bilinear-upsampled `sem_logits` (already sliced to active classes).

    Heads that emit at label resolution (UNet) skip the resize entirely.
    `use_pallas` opts into the tile kernel — measured SLOWER than the
    default einsum path on v5e (module docstring); exposed for other
    topologies.
    """
    if sem_logits.shape[1:3] == tuple(out_hw):
        return _argmax_conf_from(sem_logits.astype(jnp.float32))
    kh, kw = _kmats(sem_logits, out_hw)
    if use_pallas and _pallas_ok(sem_logits, out_hw):
        return _argmax_conf_pallas(sem_logits, kh, kw)
    return _argmax_conf_jnp(sem_logits, kh, kw)
