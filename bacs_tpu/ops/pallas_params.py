"""Shared Mosaic compiler params for every Pallas kernel in ops/.

Mosaic's default scoped-VMEM budget is 16 MB; the upsample+CE kernel
family's stack (H-interp windows + per-block class tiles) measures
17.4 MB at the production 512²/c21 shapes, which compile-crashes on a
COLD cache ("Scoped allocation ... exceeded scoped vmem limit" —
discovered round 3 when scripts/check_kernels_tpu.py forced fresh
compiles; the training benches had been riding the persistent compile
cache). v5e has 128 MB of VMEM per core — raise the per-kernel budget
well past the measured need and leave headroom for double buffering.
"""

from __future__ import annotations

VMEM_LIMIT_BYTES = 96 * 1024 * 1024


def tpu_compiler_params():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES)
