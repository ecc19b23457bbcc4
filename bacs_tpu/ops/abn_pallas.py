"""Pallas TPU kernel: fused normalize+affine+leaky-relu apply pass.

One HBM read + one HBM write per element — the bandwidth-optimal apply for
ABN (the reference burns a CUDA kernel on this, inplace_abn; SURVEY §2.10).
The [C] statistic/affine vectors ride along in VMEM and broadcast on the VPU.

Tiling: the input is viewed as [R, C] rows (R = N·H·W); the grid walks
row-tiles of 256 with channel blocks of the full C (channel counts in this
framework are 64..2048 — multiples of 128 except tiny test nets, which fall
back to the jnp path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bacs_tpu.ops.pallas_params import tpu_compiler_params

Array = jax.Array

_ROW_TILE = 256


def pallas_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _kernel(x_ref, mean_ref, inv_ref, scale_ref, bias_ref, out_ref, *, slope):
    x = x_ref[:].astype(jnp.float32)
    mean = mean_ref[0, :]
    inv = inv_ref[0, :]
    scale = scale_ref[0, :]
    bias = bias_ref[0, :]
    y = (x - mean[None, :]) * (inv * scale)[None, :] + bias[None, :]
    out_ref[:] = jnp.where(y >= 0, y, y * slope).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("slope",))
def abn_apply_pallas(
    x: Array, mean: Array, inv: Array, scale: Array, bias: Array,
    slope: float = 0.01,
) -> Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = x.shape
    c = x.shape[-1]
    rows = x.size // c
    if c % 128 != 0 or rows % 8 != 0:
        # shapes too small/ragged for clean tiling — jnp fallback
        xf = x.astype(jnp.float32)
        y = (xf - mean) * (inv * scale) + bias
        return jnp.where(y >= 0, y, y * slope).astype(x.dtype)

    x2 = x.reshape(rows, c)
    tile = min(_ROW_TILE, rows)
    while rows % tile:
        tile //= 2
    grid = (rows // tile,)
    vec = lambda v: v.reshape(1, c).astype(jnp.float32)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(_kernel, slope=slope),
        out_shape=jax.ShapeDtypeStruct((rows, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=tpu_compiler_params(),
    )(x2, vec(mean), vec(inv), vec(scale), vec(bias))
    return out.reshape(orig_shape)
