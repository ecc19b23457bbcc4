"""Shared plumbing for the fused upsample+loss Pallas kernel family.

Everything that is NOT a specific loss' math lives here, so each variant in
ops/upsample_ce.py is its per-tile math only (VERDICT r3 next #6: the
scaffolding used to be re-copied per variant):

* interp-matrix construction (global and shard-local windows) and the
  block-local H-interp decomposition (`block_kh`),
* the W-interp + NEG channel-padding preamble (`w_interp`),
* pallas_call scaffolding: lead operands/BlockSpecs for the one-logit
  (`prep_call`) and two-logit (`prep_call_pair`) layouts plus every
  output/extra-operand spec,
* kernel factories `make_sums_kernel` / `make_dz_kernel` (and `_pair`
  variants): the grid/init/tile-read/scalar-store/dz-scatter head+tail
  around a variant-supplied per-tile function,
* call wrappers `call_sums` / `call_dz` that assemble the pallas_call and
  the trailing W-transpose einsum,
* the `use_pallas` gate (TPU backend + tile-divisibility preconditions).

Kernel-design invariants (hard-won, see ops/upsample_ce.py's module
docstring for the full decomposition): channels ride SUBLANES with −1e30
padding so no channel masking is needed; every channel-reduced quantity
stays keepdims [R,1,W] (arithmetic between sublane-reduced 2D vectors trips
Mosaic "invalid relayout"); scalar accumulators are masked [8,128] tiles
(scalar VMEM stores don't lower); per-image cotangents are UNBLOCKED [N,1]
SMEM vectors (blocked (1,1) specs over [N,1] are rejected).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bacs_tpu.ops.pallas_params import tpu_compiler_params

Array = jax.Array

NEG = -1e30
ROW_BLOCK = 32  # output rows per grid step


# ---------------------------------------------------------------------------
# interp matrices
# ---------------------------------------------------------------------------


def interp_matrix(
    out_dim: int,
    in_dim: int,
    scale: Optional[float] = None,
    offset: float = 0.0,
    clamp: bool = True,
) -> np.ndarray:
    """[out, in] bilinear matrix with half-pixel centers (align_corners=False).

    `scale`/`offset`/`clamp=False` build SHARD-LOCAL windows: coords =
    (r+0.5)·scale − 0.5 + offset indexes a halo-padded local block (the
    spatial-partitioning path; uniform across shards because the shard size
    divides the 8× upsample period).
    """
    if scale is None:
        if out_dim == in_dim:
            k = np.zeros((out_dim, in_dim), np.float32)
            np.fill_diagonal(k, 1.0)
            return k
        scale = in_dim / out_dim
    k = np.zeros((out_dim, in_dim), np.float32)
    coords = (np.arange(out_dim) + 0.5) * scale - 0.5 + offset
    if clamp:
        coords = np.clip(coords, 0, in_dim - 1)
    lo = np.floor(coords).astype(np.int64)
    assert lo.min() >= 0 and lo.max() + 1 <= in_dim, (
        f"interp window escapes the block: {lo.min()}..{lo.max()+1} vs {in_dim}"
    )
    hi = np.clip(lo + 1, 0, in_dim - 1)
    w = (coords - lo).astype(np.float32)
    k[np.arange(out_dim), lo] += 1.0 - w
    k[np.arange(out_dim), hi] += w
    return k


def kmats(sem, out_hw, interp=None):
    """Dense numpy (kh, kw) for this op instance.  `interp=(scale, offset)`
    selects the unclamped shard-local H matrix."""
    if interp is None:
        kh = interp_matrix(out_hw[0], sem.shape[1])
    else:
        scale, offset = interp
        kh = interp_matrix(
            out_hw[0], sem.shape[1], scale=scale, offset=offset, clamp=False
        )
    kw = interp_matrix(out_hw[1], sem.shape[2])
    return kh, kw


def block_kh(k: np.ndarray, R: int):
    """Block-local H-interp: (starts[j], kh_blocks[j, R, hb]).

    Row block j of the output reads only a short contiguous input-row window
    (8× upsampling → ~R/8+2 rows); `starts` are static sublane-aligned
    offsets, `kh_blocks` the dense interp slice for that window.
    """
    H, h = k.shape
    n_j = H // R
    hb = int(np.ceil(R * h / H)) + 2 + 8  # span + alignment slack
    hb = min(((hb + 15) // 16) * 16, h)
    starts = np.zeros((n_j,), np.int32)
    blocks = np.zeros((n_j, R, hb), np.float32)
    for j in range(n_j):
        rows = k[j * R : (j + 1) * R]
        nz = np.nonzero(rows.any(axis=0))[0]
        start = max(min(int(nz.min()) // 8 * 8, h - hb), 0)
        assert int(nz.max()) < start + hb
        starts[j] = start
        blocks[j] = rows[:, start : start + hb]
    return jnp.asarray(starts), jnp.asarray(blocks)


def upsample_jnp(sem, kh, kw):
    """Reference bilinear upsample as two einsums (the fallback path)."""
    up = jnp.einsum("Hh,nhwc->nHwc", jnp.asarray(kh), sem.astype(jnp.float32))
    return jnp.einsum("Ww,nHwc->nHWc", jnp.asarray(kw), up)


# ---------------------------------------------------------------------------
# operand preparation
# ---------------------------------------------------------------------------


def pad_c_neg(z: Array, mult: int = 8) -> Array:
    pad = (-z.shape[2]) % mult
    if pad:
        z = jnp.pad(z, ((0, 0), (0, 0), (0, pad), (0, 0)), constant_values=NEG)
    return z


def w_interp(sem: Array, kw: np.ndarray) -> Array:
    """[n,h,w,c] → [n,h,c,W] f32 with −1e30 channel padding."""
    z = jnp.einsum("Ww,nhwc->nhcW", jnp.asarray(kw), sem.astype(jnp.float32))
    return pad_c_neg(z)


def pad_w(weights: Array, c_pad: int) -> Array:
    """Per-class vector → [1, c_pad, 1] (pad channels carry weight 0)."""
    w = weights.astype(jnp.float32)
    return jnp.pad(w, (0, c_pad - w.shape[0])).reshape(1, c_pad, 1)


def prep_call(sem, labels, kh, kw):
    """Shared pallas_call scaffolding for every one-logit variant:
    (lead_args, lead_specs, dims) — lead operands are always
    (starts, z, labels, kh_blocks) with identical BlockSpecs; variants
    append their extra operands after these.  kh/kw are dense NUMPY
    matrices (possibly shard-local)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, _ = sem.shape
    H, W = kh.shape[0], kw.shape[0]
    z = w_interp(sem, kw)
    c_pad = z.shape[2]
    starts, kh_blocks = block_kh(kh, ROW_BLOCK)
    hb = kh_blocks.shape[2]
    lead_args = (starts, z, labels.astype(jnp.int32), kh_blocks)
    lead_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, h, c_pad, W), lambda i, j: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ROW_BLOCK, W), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ROW_BLOCK, hb), lambda i, j: (j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    dims = dict(n=n, h=h, H=H, W=W, c_pad=c_pad, hb=hb,
                grid=(n, H // ROW_BLOCK))
    return lead_args, lead_specs, dims


def prep_call_pair(sem_new, sem_old, kh, kw):
    """pallas_call scaffolding for the two-logit (student, teacher) kernels:
    both W-interped to [n, h, c_pad, W] with the teacher NEG-padded to the
    STUDENT's channel tile so all per-pixel math is elementwise."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, _, _ = sem_new.shape
    H, W = kh.shape[0], kw.shape[0]
    z_new = w_interp(sem_new, kw)
    c_pad = z_new.shape[2]
    z_old = w_interp(sem_old, kw)
    if z_old.shape[2] < c_pad:
        z_old = jnp.pad(
            z_old, ((0, 0), (0, 0), (0, c_pad - z_old.shape[2]), (0, 0)),
            constant_values=NEG,
        )
    starts, kh_blocks = block_kh(kh, ROW_BLOCK)
    hb = kh_blocks.shape[2]
    z_spec = pl.BlockSpec((1, h, c_pad, W), lambda i, j: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    args = (starts, z_new, z_old, kh_blocks)
    specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        z_spec,
        z_spec,
        pl.BlockSpec((1, ROW_BLOCK, hb), lambda i, j: (j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    dims = dict(n=n, h=h, H=H, W=W, c_pad=c_pad, hb=hb,
                grid=(n, H // ROW_BLOCK))
    return args, specs, dims


# ---------------------------------------------------------------------------
# output / extra-operand specs
# ---------------------------------------------------------------------------


def sum_out_spec(dims):
    """Per-image scalar accumulator tile (slot k lives at [n, 0, k])."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return (
        jax.ShapeDtypeStruct((dims["n"], 8, 128), jnp.float32),
        pl.BlockSpec((1, 8, 128), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    )


def dz_out_spec(dims):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return (
        jax.ShapeDtypeStruct(
            (dims["n"], dims["h"], dims["c_pad"], dims["W"]), jnp.float32
        ),
        pl.BlockSpec(
            (1, dims["h"], dims["c_pad"], dims["W"]),
            lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM,
        ),
    )


def labels_out_spec(dims):
    """Full-res int32 label map output (the pseudo-label kernel)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return (
        jax.ShapeDtypeStruct((dims["n"], dims["H"], dims["W"]), jnp.int32),
        pl.BlockSpec((1, ROW_BLOCK, dims["W"]), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
    )


def g_spec():
    """Scalar cotangent: blocked [1,1] SMEM."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)


def gvec_spec():
    """Per-image cotangent: the UNBLOCKED [N, 1] SMEM vector (the bwd
    kernel indexes it by the image grid dim when per_image_g=True)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.BlockSpec(memory_space=pltpu.SMEM)


def wvec_spec(dims):
    """Per-class [1, c_pad, 1] vector broadcast to every block."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.BlockSpec((1, dims["c_pad"], 1), lambda i, j: (0, 0, 0),
                        memory_space=pltpu.VMEM)


def ms_spec(dims):
    """Full-res per-pixel map sliced like the labels ([1, R, W] blocks)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.BlockSpec((1, ROW_BLOCK, dims["W"]), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)


# ---------------------------------------------------------------------------
# in-kernel helpers + kernel factories
# ---------------------------------------------------------------------------


def read_tile(starts_ref, z_ref, kh_ref, hb):
    """H-interp this grid step's [R, c, W] tile from its input-row window."""
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    start = starts_ref[j]
    zs = z_ref[0, pl.ds(start, hb)]
    ky = kh_ref[0]
    tile = jnp.einsum("Rh,hcW->RcW", ky, zs,
                      preferred_element_type=jnp.float32)
    return start, ky, tile


def accum_scalars(out_ref, *values):
    """Accumulate scalars into slots [0, k] of the [8,128] tile (scalar
    stores to VMEM are not lowerable — write a masked tile instead)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    upd = jnp.zeros((8, 128), jnp.float32)
    for k, v in enumerate(values):
        upd = upd + jnp.where((row == 0) & (col == k), v, 0.0)
    out_ref[0] += upd


def onehot_valid(labels, c_pad, ignore: int = 255):
    """(valid [R,W] bool, safe labels, channel iota [1,c,1], onehot f32)."""
    valid = labels != ignore
    safe = jnp.where(valid, labels, 0)
    ch = jax.lax.broadcasted_iota(jnp.int32, (1, c_pad, 1), 1)
    onehot = (ch == safe[:, None, :]).astype(jnp.float32)
    return valid, safe, ch, onehot


def make_sums_kernel(tile_sums):
    """fwd kernel: per grid step H-interp the tile, hand it (with the label
    block and any extra operand REFS) to `tile_sums`, and accumulate the
    returned scalars into the per-image slots."""
    import jax.experimental.pallas as pl

    def kernel(starts_ref, z_ref, labels_ref, kh_ref, *rest, hb):
        extras, out_ref = rest[:-1], rest[-1]
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        _, _, tile = read_tile(starts_ref, z_ref, kh_ref, hb)
        accum_scalars(out_ref, *tile_sums(tile, labels_ref[0], *extras))

    return kernel


def make_dz_kernel(tile_grad, per_image_g: bool = False):
    """bwd kernel: `tile_grad(tile, labels, g, *extra_refs)` returns the
    [R, c, W] cotangent tile, scattered into dz via the transposed
    block-local H-interp."""
    import jax.experimental.pallas as pl

    def kernel(starts_ref, z_ref, labels_ref, kh_ref, *rest, hb):
        extras, g_ref, dz_ref = rest[:-2], rest[-2], rest[-1]
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            dz_ref[...] = jnp.zeros_like(dz_ref)

        start, ky, tile = read_tile(starts_ref, z_ref, kh_ref, hb)
        g = g_ref[pl.program_id(0), 0] if per_image_g else g_ref[0, 0]
        dtile = tile_grad(tile, labels_ref[0], g, *extras)
        dz_ref[0, pl.ds(start, hb)] += jnp.einsum(
            "Rh,RcW->hcW", ky, dtile, preferred_element_type=jnp.float32
        )

    return kernel


def make_pair_sums_kernel(tile_sums):
    """Two-logit fwd: `tile_sums(tile_new, tile_old)` → scalars."""
    import jax.experimental.pallas as pl

    def kernel(starts_ref, zn_ref, zo_ref, kh_ref, out_ref, *, hb):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            out_ref[...] = jnp.zeros_like(out_ref)

        _, _, tn = read_tile(starts_ref, zn_ref, kh_ref, hb)
        _, _, to = read_tile(starts_ref, zo_ref, kh_ref, hb)
        accum_scalars(out_ref, *tile_sums(tn, to))

    return kernel


def make_pair_dz_kernel(tile_grad):
    """Two-logit bwd: gradient w.r.t. the STUDENT tile only (the teacher's
    cotangent is hard zero by KD semantics)."""
    import jax.experimental.pallas as pl

    def kernel(starts_ref, zn_ref, zo_ref, kh_ref, g_ref, dz_ref, *, hb):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            dz_ref[...] = jnp.zeros_like(dz_ref)

        start, ky, tn = read_tile(starts_ref, zn_ref, kh_ref, hb)
        _, _, to = read_tile(starts_ref, zo_ref, kh_ref, hb)
        dtile = tile_grad(tn, to, g_ref[0, 0])
        dz_ref[0, pl.ds(start, hb)] += jnp.einsum(
            "Rh,RcW->hcW", ky, dtile, preferred_element_type=jnp.float32
        )

    return kernel


# ---------------------------------------------------------------------------
# call wrappers
# ---------------------------------------------------------------------------


def call_sums(kernel, prep, extras=(), extra_specs=()):
    """Run a sums kernel; returns the raw [n, 8, 128] accumulator (slot k of
    image n at [n, 0, k])."""
    import jax.experimental.pallas as pl

    lead, specs, dims = prep
    out_shape, out_spec = sum_out_spec(dims)
    return pl.pallas_call(
        partial(kernel, hb=dims["hb"]),
        out_shape=out_shape,
        grid=dims["grid"],
        in_specs=specs + list(extra_specs),
        out_specs=out_spec,
        compiler_params=tpu_compiler_params(),
    )(*lead, *extras)


def finish_dz(dz, kw, sem):
    """Transpose the W-interp outside the kernel (one einsum on the small
    side) and drop the NEG channel padding."""
    dsem = jnp.einsum("Ww,nhcW->nhwc", jnp.asarray(kw),
                      dz[:, :, : sem.shape[-1], :])
    return dsem.astype(sem.dtype)


def call_dz(kernel, prep, kw, sem, g, extras=(), extra_specs=(),
            g_is_vec: bool = False):
    """Run a dz kernel with scalar ([1,1] SMEM) or per-image ([N,1] SMEM)
    cotangent; returns dsem."""
    import jax.experimental.pallas as pl

    lead, specs, dims = prep
    out_shape, out_spec = dz_out_spec(dims)
    gs = gvec_spec() if g_is_vec else g_spec()
    garg = g.reshape(-1, 1) if g_is_vec else g.reshape(1, 1)
    dz = pl.pallas_call(
        partial(kernel, hb=dims["hb"]),
        out_shape=out_shape,
        grid=dims["grid"],
        in_specs=specs + list(extra_specs) + [gs],
        out_specs=out_spec,
        compiler_params=tpu_compiler_params(),
    )(*lead, *extras, garg)
    return finish_dz(dz, kw, sem)


def use_pallas(sem, out_hw) -> bool:
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:  # pragma: no cover
        return False
    h = sem.shape[1]
    return (
        out_hw[0] % ROW_BLOCK == 0
        # W is the kernel's lane dimension — Mosaic rejects sub-128 lane
        # reshapes (observed: smoke shapes W=64 fail "unsupported shape
        # cast"); production 512² is a multiple
        and out_hw[1] % 128 == 0
        and out_hw[0] >= h
        and out_hw[1] >= sem.shape[2]
    )
