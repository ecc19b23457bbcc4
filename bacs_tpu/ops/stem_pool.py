"""Fused stem: ABN apply + leaky-relu + 3x3/2 maxpool as one HBM pass.

The ResNet stem (conv 7x7/2 -> ABN -> maxpool 3x3/2, reference:
networks/resnet.py forward) is ~6 ms of the 72 ms 512^2 train step when
left to XLA: the ABN apply writes a full-resolution y (134 MB at batch 16),
the pool reads it back, and the backward runs a `select-and-scatter` plus a
dense compare-select — all HBM passes over stem-sized tensors.

This module fuses the whole post-conv stem with a `jax.custom_vjp`:

forward   (Pallas): read conv-out c once -> y = leaky(c*a+b) in VMEM ->
          3x3/2 windowed max -> write pooled p (1/4 area).  The full-res
          y never exists in HBM and no argmax codes are stored.
backward  recomputes y and the FIRST-max argmax from c in VMEM (cheaper
          than round-tripping codes through HBM), scatters the pooled
          grads to their argmax cells, and applies the BN backward in the
          same read of c — one kernel instead of select-and-scatter plus
          a dense compare-select.

The kernels avoid strided (gather) access entirely via a layout identity:
for row-major NHWC, `(h, w, C) -> (h, w//2, 2C)` is a free reshape that
puts even columns in lanes [:C] and odd columns in lanes [C:], so the
stride-2 column structure becomes static lane slices; stride-2 rows fall
out of a leading-dim `(2RB, ...) -> (RB, 2, ...)` reshape.  Windows then
only need stride-1 shifts (concat with a pad row).  The grid is blocked
over pooled rows with a one-row top halo (extra 1-row BlockSpec refs).

Batch statistics stay in jnp so XLA fuses them into the producing conv's
epilogue (measured: `convert_reduce_fusion` emitters).  Everything falls
back to pure jnp off-TPU, so CPU tests exercise the same custom-VJP math.

Pool semantics match `nn.max_pool(y, (3,3), strides=(2,2), padding=(1,1))`
for even H, W (output H/2, W/2), with gradient routed to the first max in
each window (torch/XLA select-and-scatter semantics).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from bacs_tpu.ops.pallas_params import tpu_compiler_params

Array = jax.Array

_NEG = -1e30  # big negative instead of -inf: keeps bf16 arithmetic NaN-free


def _pool_codes_jnp(y: Array) -> Tuple[Array, Array]:
    """3x3/2 max + first-max argmax codes (ky*3+kx) via shifted planes."""
    n, h, w, c = y.shape
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=_NEG)
    best = jnp.full((n, h // 2, w // 2, c), jnp.asarray(_NEG, y.dtype))
    code = jnp.zeros((n, h // 2, w // 2, c), jnp.int32)
    for ky in range(3):
        for kx in range(3):
            cand = yp[:, ky : ky + h : 2, kx : kx + w : 2, :]
            take = cand > best  # strict: first occurrence wins
            best = jnp.where(take, cand, best)
            code = jnp.where(take, ky * 3 + kx, code)
    return best, code


def _shift01(p: Array, dy: int, dx: int, yaxis: int) -> Array:
    """out[t] = p[t+dy] along yaxis (and t+dx along yaxis+1), zero-filled.

    dy, dx are only ever 0 or 1 for a 3x3/2 pool: an input cell's windows
    are the one at its own pooled index and (for odd parities) the next one.
    """
    if dy:
        z = jnp.zeros_like(jax.lax.slice_in_dim(p, 0, 1, axis=yaxis))
        p = jnp.concatenate(
            [jax.lax.slice_in_dim(p, 1, p.shape[yaxis], axis=yaxis), z],
            axis=yaxis,
        )
    if dx:
        xa = yaxis + 1
        z = jnp.zeros_like(jax.lax.slice_in_dim(p, 0, 1, axis=xa))
        p = jnp.concatenate(
            [jax.lax.slice_in_dim(p, 1, p.shape[xa], axis=xa), z], axis=xa
        )
    return p


def _scatter_parity(planes, py, px, yaxis):
    """Sum plane contributions landing on input cells of parity (py, px).

    Input row y = 2t+py belongs to window row wy = t + (py-ky+1)/2 for the
    ky of matching parity; even rows only see the window middle (ky=1),
    odd rows see ky=0 of the next window and ky=2 of their own.
    """
    tot = None
    for ky in range(3):
        for kx in range(3):
            if (ky - 1) % 2 != py % 2 or (kx - 1) % 2 != px % 2:
                continue
            dy = (py - ky + 1) // 2
            dx = (px - kx + 1) // 2
            term = _shift01(planes[ky * 3 + kx], dy, dx, yaxis)
            tot = term if tot is None else tot + term
    return tot


def _scatter_codes_jnp(dap: Array, code: Array, h: int, w: int) -> Array:
    """Inverse of _pool_codes_jnp: route pooled grads to their argmax cell."""
    planes = [dap * (code == k).astype(dap.dtype) for k in range(9)]
    n, h2, w2, ch = dap.shape
    ee = _scatter_parity(planes, 0, 0, 1)
    eo = _scatter_parity(planes, 0, 1, 1)
    oe = _scatter_parity(planes, 1, 0, 1)
    oo = _scatter_parity(planes, 1, 1, 1)
    even_rows = jnp.stack([ee, eo], axis=3).reshape(n, h2, w, ch)
    odd_rows = jnp.stack([oe, oo], axis=3).reshape(n, h2, w, ch)
    return jnp.stack([even_rows, odd_rows], axis=2).reshape(n, h, w, ch)


# ---------------------------------------------------------------- pallas


def _row_block(h2: int, cap: int = 32) -> int:
    for rb in (32, 16, 8, 4, 2, 1):
        if rb <= cap and h2 % rb == 0:
            return rb
    return 1


def _use_pallas(x: Array) -> bool:
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:  # pragma: no cover
        return False
    n, h, w, c = x.shape
    return h % 2 == 0 and w % 2 == 0 and w >= 16 and c <= 512


def _act(y, slope):
    return jnp.where(y >= 0, y, y * slope)


def _roll32(x, shift, axis):
    """pltpu.roll, requiring 32-bit data: Mosaic only implements 32-bit
    sublane rotates, and roll avoids its layout-offset restrictions on
    sublane concat of sliced operands (the natural concat formulation
    fails to lower).  The kernels therefore run all pooling logic in f32
    (packed-bf16 cmpf is unsupported on v5e anyway)."""
    from jax.experimental.pallas import tpu as pltpu

    assert x.dtype.itemsize == 4, x.dtype
    return pltpu.roll(x, shift, axis)


def _shift_down_neg(x, axis):
    """out[t] = x[t-1]; out[0] = _NEG."""
    r = _roll32(x, 1, axis)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    return jnp.where(idx == 0, jnp.asarray(_NEG, x.dtype), r)


def _shift_up_zero(x, axis):
    """out[t] = x[t+1]; out[-1] = 0."""
    r = _roll32(x, x.shape[axis] - 1, axis)  # roll needs shift >= 0
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    return jnp.where(
        idx == x.shape[axis] - 1, jnp.zeros_like(r), r
    )


def _col_pool(y2, C):
    """Column 3-window max over the interleaved rep.

    y2: (rows, w2, 2C) with even cols in lanes [:C], odd in [C:].
    Output col u covers input cols 2u-1 (kx=0), 2u (kx=1), 2u+1 (kx=2),
    i.e. O[u-1], E[u], O[u] — only a stride-1 shift of the odd lanes.
    Returns (max, kx_code) each (rows, w2, C).
    """
    E = y2[..., :C]
    O = y2[..., C:]
    Op = _shift_down_neg(O, 1)
    best = Op
    code = jnp.zeros(best.shape, jnp.int32)
    take = E > best
    best = jnp.where(take, E, best)
    code = jnp.where(take, 1, code)
    take = O > best
    best = jnp.where(take, O, best)
    code = jnp.where(take, 2, code)
    return best, code


def _row_pool(A0, A1, A2, C0, C1, C2):
    """Row 3-window first-max over per-row col-maxes; code = ky*3 + kx."""
    best = A0
    code = C0  # ky = 0
    take = A1 > best
    best = jnp.where(take, A1, best)
    code = jnp.where(take, C1 + 3, code)
    take = A2 > best
    best = jnp.where(take, A2, best)
    code = jnp.where(take, C2 + 6, code)
    return best, code


def _fwd_kernel(cm_ref, ct_ref, a_ref, b_ref, p_ref, *, slope, C, RB):
    j = pl.program_id(1)
    f32 = jnp.float32
    a = a_ref[0, 0][None, None, :]
    b = b_ref[0, 0][None, None, :]
    sl = jnp.asarray(slope, f32)
    # affine in f32 to match XLA's excess-precision bf16 contraction
    af = a.astype(f32)
    bf = b.astype(f32)
    ym = _act(cm_ref[0].astype(f32) * af + bf, sl)  # (2RB, w2, 2C)
    yt = _act(ct_ref[0].astype(f32) * af + bf, sl)  # row 2RB*j-1
    yt = jnp.where(j == 0, jnp.asarray(_NEG, f32), yt)

    M, _ = _col_pool(ym, C)  # (2RB, w2, C)
    Mt, _ = _col_pool(yt, C)  # (1, w2, C)
    w2 = M.shape[1]
    M2 = M.reshape(RB, 2, w2, C)
    Er = M2[:, 0]  # input rows 2tt   -> ky = 1
    Or = M2[:, 1]  # input rows 2tt+1 -> ky = 2
    Orprev = jnp.concatenate([Mt, Or[: RB - 1]], axis=0)  # rows 2tt-1, ky=0
    p = jnp.maximum(jnp.maximum(Orprev, Er), Or)
    p_ref[0] = p.astype(p_ref.dtype)


def _fwd_pallas(c: Array, a: Array, b: Array, slope: float):
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, C = c.shape
    h2, w2 = h // 2, w // 2
    RB = _row_block(h2, cap=32 if c.dtype.itemsize == 2 else 16)
    c2 = c.reshape(n, h, w2, 2 * C)  # free: row-major identity
    a2 = jnp.concatenate([a, a]).reshape(1, 1, 2 * C).astype(c.dtype)
    b2 = jnp.concatenate([b, b]).reshape(1, 1, 2 * C).astype(c.dtype)

    vspec = pl.BlockSpec((1, 1, 2 * C), lambda i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    p = pl.pallas_call(
        functools.partial(_fwd_kernel, slope=slope, C=C, RB=RB),
        out_shape=jax.ShapeDtypeStruct((n, h2, w2, C), c.dtype),
        grid=(n, h2 // RB),
        in_specs=[
            pl.BlockSpec((1, 2 * RB, w2, 2 * C),
                             lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
            # one-row top halo: global row 2*RB*j - 1 (clamped; masked j==0)
            pl.BlockSpec((1, 1, w2, 2 * C),
                             lambda i, j: (i, jnp.maximum(2 * RB * j - 1, 0),
                                           0, 0),
                             memory_space=pltpu.VMEM),
            vspec,
            vspec,
        ],
        out_specs=pl.BlockSpec((1, RB, w2, C), lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
        compiler_params=tpu_compiler_params(),
    )(c2, c2, a2, b2)
    return p


def _bwd_kernel(cm_ref, ct_ref, cb1_ref, cb2_ref, dm_ref, dn_ref,
                a_ref, b_ref, g_ref, gmda_ref, gmdax_ref, mean_ref, inv_ref,
                dc_ref, *, slope, C, RB):
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    f32 = jnp.float32
    a = a_ref[0, 0][None, None, :]
    b = b_ref[0, 0][None, None, :]
    sl = jnp.asarray(slope, f32)
    neg = jnp.asarray(_NEG, f32)

    af = a.astype(f32)
    bf = b.astype(f32)
    ym = _act(cm_ref[0].astype(f32) * af + bf, sl)  # (2RB, w2, 2C)
    yt = _act(ct_ref[0].astype(f32) * af + bf, sl)  # row 2RB*j-1
    yb1 = _act(cb1_ref[0].astype(f32) * af + bf, sl)  # row 2RB*(j+1)
    yb2 = _act(cb2_ref[0].astype(f32) * af + bf, sl)  # row 2RB*(j+1)+1
    yt = jnp.where(j == 0, neg, yt)
    last = j == nj - 1
    yb1 = jnp.where(last, neg, yb1)
    yb2 = jnp.where(last, neg, yb2)

    M, K = _col_pool(ym, C)
    Mt, Kt = _col_pool(yt, C)
    Mb1, Kb1 = _col_pool(yb1, C)
    Mb2, Kb2 = _col_pool(yb2, C)
    w2 = M.shape[1]
    M2 = M.reshape(RB, 2, w2, C)
    K2 = K.reshape(RB, 2, w2, C)
    Er, Or = M2[:, 0], M2[:, 1]
    Ekr, Okr = K2[:, 0], K2[:, 1]

    # pooled rows tt = 0..RB (incl. one halo row owned by the next block)
    A0 = jnp.concatenate([Mt, Or], axis=0)  # rows 2tt-1
    C0 = jnp.concatenate([Kt, Okr], axis=0)
    A1 = jnp.concatenate([Er, Mb1], axis=0)  # rows 2tt
    C1 = jnp.concatenate([Ekr, Kb1], axis=0)
    A2 = jnp.concatenate([Or, Mb2], axis=0)  # rows 2tt+1
    C2 = jnp.concatenate([Okr, Kb2], axis=0)
    _, code = _row_pool(A0, A1, A2, C0, C1, C2)  # (RB+1, w2, C)

    dnext = jnp.where(last, jnp.zeros_like(dn_ref[0]), dn_ref[0])
    dap = jnp.concatenate(
        [dm_ref[0], dnext], axis=0
    ).astype(f32)  # (RB+1, w2, C)

    def plane(k):
        return jnp.where(code == k, dap, jnp.zeros_like(dap))

    def shl(p):  # p[:, u+1], zero at the right edge
        return _shift_up_zero(p, 1)

    # own pooled rows tt=0..RB-1 give ky=1/2 terms; tt+1 gives ky=0 terms
    dee = plane(4)[:RB]
    deo = plane(5)[:RB] + shl(plane(3))[:RB]
    doe = plane(7)[:RB] + plane(1)[1:]
    doo = (plane(8)[:RB] + shl(plane(6))[:RB]
           + plane(2)[1:] + shl(plane(0))[1:])

    even_rows = jnp.concatenate([dee, deo], axis=-1)  # (RB, w2, 2C)
    odd_rows = jnp.concatenate([doe, doo], axis=-1)
    da = jnp.stack([even_rows, odd_rows], axis=1).reshape(2 * RB, w2, 2 * C)

    g = g_ref[0, 0][None, None, :].astype(f32)
    x_hat = (cm_ref[0].astype(f32) - mean_ref[0, 0][None, None, :].astype(f32)) \
        * inv_ref[0, 0][None, None, :].astype(f32)
    dc = g * da - gmda_ref[0, 0][None, None, :].astype(f32) \
        - gmdax_ref[0, 0][None, None, :].astype(f32) * x_hat
    dc_ref[0] = dc.astype(dc_ref.dtype)


def _bwd_pallas(c, dap, g, g_mean_da, g_mean_da_xhat, mean, inv,
                scale, bias, slope):
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, C = c.shape
    h2, w2 = h // 2, w // 2
    # f32 temporaries: larger RB busts the 16MB scoped-vmem limit
    RB = _row_block(h2, cap=16 if c.dtype.itemsize == 2 else 8)
    c2 = c.reshape(n, h, w2, 2 * C)
    dt = c.dtype

    def vec2(v):  # per-channel vector tiled over both column parities
        return jnp.concatenate([v, v]).reshape(1, 1, 2 * C).astype(dt)

    vspec = pl.BlockSpec((1, 1, 2 * C), lambda i, j: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    row = lambda r: (lambda i, j, r=r: (i, r(j), 0, 0))  # noqa: E731
    dc2 = pl.pallas_call(
        functools.partial(_bwd_kernel, slope=slope, C=C, RB=RB),
        out_shape=jax.ShapeDtypeStruct((n, h, w2, 2 * C), dt),
        grid=(n, h2 // RB),
        in_specs=[
            pl.BlockSpec((1, 2 * RB, w2, 2 * C),
                             lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w2, 2 * C),
                             row(lambda j: jnp.maximum(2 * RB * j - 1, 0)),
                             memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w2, 2 * C),
                             row(lambda j: jnp.minimum(2 * RB * (j + 1),
                                                       h - 1)),
                             memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w2, 2 * C),
                             row(lambda j: jnp.minimum(2 * RB * (j + 1) + 1,
                                                       h - 1)),
                             memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RB, w2, C), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w2, C),
                             row(lambda j: jnp.minimum(RB * (j + 1),
                                                       h2 - 1)),
                             memory_space=pltpu.VMEM),
        ] + [vspec] * 7,
        out_specs=pl.BlockSpec((1, 2 * RB, w2, 2 * C),
                                   lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
        compiler_params=tpu_compiler_params(),
    )(c2, c2, c2, c2, dap, dap,
      vec2(scale * inv), vec2(bias - mean * inv * scale),
      vec2(g), vec2(g_mean_da), vec2(g_mean_da_xhat), vec2(mean), vec2(inv))
    return dc2.reshape(n, h, w, C)


# ------------------------------------------------------------ custom VJP


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_abn_pool(
    c: Array,
    scale: Array,
    bias: Array,
    eps: float = 1e-5,
    slope: float = 0.01,
    axis_name: Optional[str] = None,
) -> Tuple[Array, Array, Array]:
    """(pooled, batch_mean, batch_var) = maxpool3x3/2(leaky(BN(c)))."""
    p, am, mean, var = _fwd_impl(c, scale, bias, eps, slope, axis_name)
    return p, mean, var


def _fwd_impl(c, scale, bias, eps, slope, axis_name):
    reduce_axes = tuple(range(c.ndim - 1))
    mean = jnp.mean(c, axis=reduce_axes, dtype=jnp.float32)
    mean_sq = jnp.mean(jnp.square(c), axis=reduce_axes, dtype=jnp.float32)
    if axis_name is not None:
        mean, mean_sq = jax.lax.pmean((mean, mean_sq), axis_name)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    a = (inv * scale).astype(c.dtype)
    b = (bias - mean * inv * scale).astype(c.dtype)
    if _use_pallas(c):
        p = _fwd_pallas(c, a, b, slope)
        am = None  # backward recomputes the argmax from c in VMEM
    else:
        y = c * a + b
        y = jnp.where(y >= 0, y, y * jnp.asarray(slope, c.dtype))
        p, am = _pool_codes_jnp(y)
    return p, am, mean, var


def _fused_abn_pool_fwd(c, scale, bias, eps, slope, axis_name):
    p, am, mean, var = _fwd_impl(c, scale, bias, eps, slope, axis_name)
    inv = jax.lax.rsqrt(var + eps)
    n = 1
    for d in c.shape[:-1]:
        n *= d
    return (p, mean, var), (c, p, am, scale, bias, mean, inv, n)


def _fused_abn_pool_bwd(eps, slope, axis_name, res, cts):
    c, p, am, scale, bias, mean, inv, n = res
    dp, _, _ = cts  # mean/var feed stop-gradient running-stat updates
    dtype = c.dtype

    # da at max positions from (p, dp) alone: sign(y at max) == sign(p),
    # and x_hat at max recovers from p by inverting activation + affine
    dap = jnp.where(p >= 0, dp, dp * jnp.asarray(slope, dtype)).astype(dtype)
    z = jnp.where(p >= 0, p, p * jnp.asarray(1.0 / slope, dtype))
    from bacs_tpu.ops.abn_core import _safe_scale

    x_hat_max = (z - bias.astype(dtype)) * (
        1.0 / _safe_scale(scale)
    ).astype(dtype)
    sum_da = jnp.sum(dap, axis=tuple(range(p.ndim - 1)), dtype=jnp.float32)
    sum_da_xhat = jnp.sum(
        dap * x_hat_max, axis=tuple(range(p.ndim - 1)), dtype=jnp.float32
    )
    dscale = sum_da_xhat
    dbias = sum_da
    mean_da, mean_da_xhat = sum_da / n, sum_da_xhat / n
    if axis_name is not None:
        mean_da, mean_da_xhat = jax.lax.pmean(
            (mean_da, mean_da_xhat), axis_name
        )

    g = scale * inv
    g_mean_da = (g * mean_da).astype(dtype)
    g_mean_da_xhat = (g * mean_da_xhat).astype(dtype)

    if am is None:  # pallas path: recompute argmax in VMEM
        dc = _bwd_pallas(
            c, dap, g.astype(dtype), g_mean_da, g_mean_da_xhat,
            mean, inv, scale, bias, slope,
        )
    else:
        h, w = c.shape[1], c.shape[2]
        da = _scatter_codes_jnp(dap, am, h, w)
        x_hat = (c - mean.astype(dtype)) * inv.astype(dtype)
        dc = g.astype(dtype) * da - g_mean_da - g_mean_da_xhat * x_hat
        dc = dc.astype(dtype)
    return dc, dscale, dbias


fused_abn_pool.defvjp(_fused_abn_pool_fwd, _fused_abn_pool_bwd)
