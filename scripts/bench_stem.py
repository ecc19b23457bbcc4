"""Microbench: ResNet stem 7x7/2 conv vs space-to-depth equivalent on TPU.

The MLPerf-style stem trick: space-to-depth the input (2x2 blocks -> 12
channels), pad the 7x7 kernel to 8x8 (zero row/col at the top/left), and
run the equivalent 4x4 stride-1 conv in block space.  C_in=3 convs map
poorly to the MXU; C_in=12 at quarter the pixels is strictly better.

Verifies exact numerical equivalence, then times fwd and fwd+dw.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bacs_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def timeit(fn, *args, repeats=20):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][0, 0])  # sync through axon tunnel
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0][0, 0])
    return (time.perf_counter() - t0) / repeats


def main(batch=16, size=512, dtype=jnp.bfloat16):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, size, size, 3).astype(np.float32))
    k = jnp.asarray(rng.randn(7, 7, 3, 64).astype(np.float32) * 0.1)

    dn = jax.lax.conv_dimension_numbers(
        (batch, size, size, 3), (7, 7, 3, 64), ("NHWC", "HWIO", "NHWC")
    )

    @jax.jit
    def stem_direct(x, k):
        return jax.lax.conv_general_dilated(
            x.astype(dtype), k.astype(dtype), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=dn,
        )

    def s2d(x):
        n, h, w, c = x.shape
        x = x.reshape(n, h // 2, 2, w // 2, 2, c)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)

    def k_s2d(k):
        # pad 7x7 -> 8x8 with a zero row/col at the TOP/LEFT, then fold each
        # 2x2 spatial block into channels with the same (di,dj,c) order as s2d
        k8 = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
        kh = k8.reshape(4, 2, 4, 2, 3, 64)
        return kh.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 12, 64)

    dn2 = jax.lax.conv_dimension_numbers(
        (batch, size // 2, size // 2, 12), (4, 4, 12, 64),
        ("NHWC", "HWIO", "NHWC"),
    )

    @jax.jit
    def stem_s2d(x, k):
        xs = s2d(x).astype(dtype)
        ks = k_s2d(k).astype(dtype)
        return jax.lax.conv_general_dilated(
            xs, ks, (1, 1), [(2, 1), (2, 1)], dimension_numbers=dn2
        )

    a = np.asarray(stem_direct(x, k), np.float32)
    b = np.asarray(stem_s2d(x, k), np.float32)
    print(f"shapes: {a.shape} vs {b.shape}; max|diff| = {np.abs(a - b).max():.4f}"
          f"  (rel {np.abs(a - b).max() / (np.abs(a).max() + 1e-9):.2e})")

    t1 = timeit(stem_direct, x, k)
    t2 = timeit(stem_s2d, x, k)
    print(f"fwd   direct: {t1 * 1e3:7.2f} ms   s2d: {t2 * 1e3:7.2f} ms")

    g1 = jax.jit(jax.grad(lambda k, x: jnp.sum(stem_direct(x, k).astype(jnp.float32))))
    g2 = jax.jit(jax.grad(lambda k, x: jnp.sum(stem_s2d(x, k).astype(jnp.float32))))
    t1 = timeit(g1, k, x)
    t2 = timeit(g2, k, x)
    print(f"dw    direct: {t1 * 1e3:7.2f} ms   s2d: {t2 * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
