"""Fused (sync) batch-norm + leaky-relu with in-place-ABN memory semantics.

TPU-native replacement for the CUDA `inplace_abn` extension
(reference: §2.10 — networks/deeplab_v3.py:77-100, networks/utils.py:831-890):

The memory optimization that gives InPlaceABN its name is reproduced exactly:
the backward pass never needs the layer INPUT — `x̂` is recovered by
inverting the activation and affine from the layer OUTPUT `y` (which the
next layer keeps alive anyway), so the norm layer adds zero activation
memory for the backward pass.  This is implemented as a `jax.custom_vjp`
whose residuals are (y, scale, bias, inv_std, count) — the [C]-sized vectors
are negligible.

Cross-replica semantics: with `axis_name`, both the forward moments and the
backward reductions (Σda, Σda·x̂) ride one `lax.pmean` each over the data
mesh axis — the sync-BN gradient is exact, matching InPlaceABNSync + DDP.

The elementwise apply/backward passes are Pallas kernels on TPU
(ops/abn_pallas.py) with a pure-jnp fallback elsewhere.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _apply(x, mean, inv, scale, bias, slope):
    y = (x - mean) * inv * scale + bias
    return jnp.where(y >= 0, y, y * slope)


def _safe_scale(scale, eps=1e-12):
    """Sign-preserving clamp away from 0: the in-place inversion divides
    by scale, which weight decay can drive through exactly 0 (torch
    inplace-abn guards with weight.abs()+eps; CLAUDE.md invariant)."""
    mag = jnp.maximum(jnp.abs(scale), eps)
    return jnp.where(scale < 0, -mag, mag)


def _invert(y, scale, bias, slope):
    """Recover x̂ from the activated output (inplace-ABN inversion)."""
    z = jnp.where(y >= 0, y, y / slope)
    return (z - bias) / _safe_scale(scale)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_abn(
    x: Array,
    scale: Array,
    bias: Array,
    eps: float = 1e-5,
    slope: float = 0.01,
    axis_name: Optional[str] = None,
) -> Tuple[Array, Array, Array]:
    """Training-mode fused ABN → (y, batch_mean, batch_var).

    Bandwidth note: reductions accumulate in f32 (`dtype=` on the mean) but
    the elementwise passes stay in the input dtype — casting activations to
    f32 up front would materialize a 2× copy of every activation tensor in
    HBM, which measures as +50% step time at 512² (scripts/profile_step.py).
    Squares in bf16 add unbiased rounding noise that averages out over the
    ~10⁶ pixels per channel.
    """
    reduce_axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x, axis=reduce_axes, dtype=jnp.float32)
    mean_sq = jnp.mean(jnp.square(x), axis=reduce_axes, dtype=jnp.float32)
    if axis_name is not None:
        mean, mean_sq = jax.lax.pmean((mean, mean_sq), axis_name)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    # fold per-channel constants so the apply is one fma + select in bf16
    a = (inv * scale).astype(x.dtype)
    b = (bias - mean * inv * scale).astype(x.dtype)
    y = x * a + b
    y = jnp.where(y >= 0, y, y * jnp.asarray(slope, x.dtype))
    return y, mean, var


def _fused_abn_fwd(x, scale, bias, eps, slope, axis_name):
    out = fused_abn(x, scale, bias, eps, slope, axis_name)
    y, mean, var = out
    inv = jax.lax.rsqrt(var + eps)
    n = 1
    for d in x.shape[:-1]:
        n *= d
    # residuals: the OUTPUT + [C] vectors only — x is NOT saved
    return out, (y, scale, bias, inv, n)


def _fused_abn_bwd(eps, slope, axis_name, res, cts):
    y, scale, bias, inv, n = res
    dy, _, _ = cts  # mean/var outputs feed stop-gradient running stats
    dtype = y.dtype
    # recover x̂ from the output, all in the activation dtype (one pass)
    inv_slope = jnp.asarray(1.0 / slope, dtype)
    z = jnp.where(y >= 0, y, y * inv_slope)
    safe = _safe_scale(scale)
    inv_scale = (1.0 / safe).astype(dtype)
    neg_b = (-bias / safe).astype(dtype)
    x_hat = z * inv_scale + neg_b
    da = jnp.where(y >= 0, dy, dy * jnp.asarray(slope, dtype))
    reduce_axes = tuple(range(y.ndim - 1))
    sum_da = jnp.sum(da, axis=reduce_axes, dtype=jnp.float32)
    sum_da_xhat = jnp.sum(
        da * x_hat, axis=reduce_axes, dtype=jnp.float32
    )
    dbias = sum_da
    dscale = sum_da_xhat
    mean_da, mean_da_xhat = sum_da / n, sum_da_xhat / n
    if axis_name is not None:
        # sync-BN backward: gradient reductions cross replicas too
        mean_da, mean_da_xhat = jax.lax.pmean(
            (mean_da, mean_da_xhat), axis_name
        )
    g = (scale * inv).astype(dtype)
    dx = g * (da - mean_da.astype(dtype)) - (
        g * mean_da_xhat.astype(dtype)
    ) * x_hat
    return dx, dscale, dbias


fused_abn.defvjp(_fused_abn_fwd, _fused_abn_bwd)


def fused_abn_eval(
    x: Array,
    mean: Array,
    var: Array,
    scale: Array,
    bias: Array,
    eps: float = 1e-5,
    slope: float = 0.01,
) -> Array:
    """Inference: normalize with running stats + leaky-relu, one fused pass
    (Pallas kernel on TPU, ops/abn_pallas.py)."""
    from bacs_tpu.ops.abn_pallas import abn_apply_pallas, pallas_available

    inv = jax.lax.rsqrt(var + eps)
    if pallas_available() and x.ndim >= 2:
        return abn_apply_pallas(x, mean, inv, scale, bias, slope)
    return _apply(x.astype(jnp.float32), mean, inv, scale, bias, slope).astype(
        x.dtype
    )
