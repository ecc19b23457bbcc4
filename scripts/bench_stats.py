"""Microbench: XLA convert_reduce (BN stats) vs a Pallas accumulate kernel.

The train-step trace shows ~32 ms/step (of 72) in `convert_reduce_fusion`
ops — the ABN forward moments and backward (sum_da, sum_da_xhat) reductions
— running at ~18% of HBM bandwidth.  This measures whether a sequential-grid
Pallas kernel with f32 VMEM accumulators reaches bandwidth on the same
shapes.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bacs_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def _stats_kernel(x_ref, acc_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...].astype(jnp.float32)
    acc_ref[0, :] += jnp.sum(x, axis=0)
    acc_ref[1, :] += jnp.sum(x * x, axis=0)


@functools.partial(jax.jit, static_argnames=("tile",))
def pallas_stats(x, tile=512):
    c = x.shape[-1]
    rows = x.size // c
    x2 = x.reshape(rows, c)
    t = min(tile, rows)
    while rows % t:
        t //= 2
    acc = pl.pallas_call(
        _stats_kernel,
        out_shape=jax.ShapeDtypeStruct((2, c), jnp.float32),
        grid=(rows // t,),
        in_specs=[pl.BlockSpec((t, c), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )(x2)
    return acc[0] / rows, acc[1] / rows


@jax.jit
def xla_stats(x):
    axes = tuple(range(x.ndim - 1))
    return (
        jnp.mean(x, axis=axes, dtype=jnp.float32),
        jnp.mean(jnp.square(x), axis=axes, dtype=jnp.float32),
    )


def _bwd_kernel(y_ref, dy_ref, acc_ref, *, slope):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    y = y_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    da = jnp.where(y >= 0, dy, dy * slope)
    z = jnp.where(y >= 0, y, y * (1.0 / slope))
    acc_ref[0, :] += jnp.sum(da, axis=0)
    acc_ref[1, :] += jnp.sum(da * z, axis=0)


@functools.partial(jax.jit, static_argnames=("tile",))
def pallas_bwd_reduce(y, dy, tile=512):
    c = y.shape[-1]
    rows = y.size // c
    t = min(tile, rows)
    while rows % t:
        t //= 2
    acc = pl.pallas_call(
        functools.partial(_bwd_kernel, slope=0.01),
        out_shape=jax.ShapeDtypeStruct((2, c), jnp.float32),
        grid=(rows // t,),
        in_specs=[
            pl.BlockSpec((t, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
    )(y.reshape(rows, c), dy.reshape(rows, c))
    return acc[0], acc[1]


@jax.jit
def xla_bwd_reduce(y, dy):
    axes = tuple(range(y.ndim - 1))
    da = jnp.where(y >= 0, dy, dy * jnp.asarray(0.01, y.dtype))
    z = jnp.where(y >= 0, y, y * jnp.asarray(100.0, y.dtype))
    return (
        jnp.sum(da, axis=axes, dtype=jnp.float32),
        jnp.sum(da * z, axis=axes, dtype=jnp.float32),
    )


def timeit(fn, *args, repeats=30):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / repeats


def main():
    rng = np.random.RandomState(0)
    shapes = [
        (16, 256, 256, 64),
        (16, 128, 128, 256),
        (16, 64, 64, 512),
        (16, 32, 32, 1024),
        (16, 32, 32, 256),
    ]
    for shp in shapes:
        x = jnp.asarray(rng.randn(*shp).astype(np.float32)).astype(jnp.bfloat16)
        mb = x.size * 2 / 1e6
        m1, s1 = [np.asarray(v) for v in xla_stats(x)]
        m2, s2 = [np.asarray(v) for v in pallas_stats(x)]
        err = max(np.abs(m1 - m2).max(), np.abs(s1 - s2).max())
        t_x = timeit(xla_stats, x)
        t_p = timeit(pallas_stats, x)
        print(
            f"stats {str(shp):22s} {mb:6.0f}MB  xla {t_x*1e3:6.2f} ms"
            f" ({mb/1e3/t_x:5.0f} GB/s)   pallas {t_p*1e3:6.2f} ms"
            f" ({mb/1e3/t_p:5.0f} GB/s)  err={err:.1e}"
        )
    for shp in shapes[:3]:
        y = jnp.asarray(rng.randn(*shp).astype(np.float32)).astype(jnp.bfloat16)
        dy = jnp.asarray(rng.randn(*shp).astype(np.float32)).astype(jnp.bfloat16)
        mb = 2 * y.size * 2 / 1e6
        a1, b1 = [np.asarray(v) for v in xla_bwd_reduce(y, dy)]
        a2, b2 = [np.asarray(v) for v in pallas_bwd_reduce(y, dy)]
        rel = np.abs(b1 - b2).max() / (np.abs(b1).max() + 1e-9)
        t_x = timeit(xla_bwd_reduce, y, dy)
        t_p = timeit(pallas_bwd_reduce, y, dy)
        print(
            f"bwd   {str(shp):22s} {mb:6.0f}MB  xla {t_x*1e3:6.2f} ms"
            f" ({mb/1e3/t_x:5.0f} GB/s)   pallas {t_p*1e3:6.2f} ms"
            f" ({mb/1e3/t_p:5.0f} GB/s)  rel={rel:.1e}"
        )


if __name__ == "__main__":
    main()
