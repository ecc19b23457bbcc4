"""ABN: fused (synchronized) batch-norm + activation, TPU-native.

Replaces every norm flavour of the reference with one Flax module
(reference: networks/deeplab_v3.py:71-100 `_init_norm_act` supports
bn/iabn_sync/iabn/abn/iabr_sync/iabr/abr, backed by the CUDA `inplace_abn`
extension and a thread-queue SynchronizedBatchNorm, networks/utils.py:116-897):

- ``sync=True`` + an ``axis_name`` gives cross-replica statistics via
  ``lax.pmean`` over the data mesh axis — the TPU equivalent of
  InPlaceABNSync's NCCL reduction, emitted as one ICI collective by XLA.
- ``renorm=True`` gives the batch-renormalization (ABR) variant
  (reference: networks/utils.py:600-655,658-897) with clamped r/d factors.
- activation is fused into the same epilogue (XLA fuses scale+shift+leaky-relu
  into the preceding conv); a Pallas fused kernel for the full
  stats+normalize+activate HBM pass lives in ops/abn_pallas.py and is used
  for the inference path.

`momentum` follows torch semantics: running = (1-m)*running + m*batch.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def _activate(x: Array, activation: str, param: float) -> Array:
    if activation == "leaky_relu":
        return jnp.where(x >= 0, x, x * param)
    if activation == "relu":
        return jnp.maximum(x, 0.0)
    if activation == "elu":
        return jnp.where(x >= 0, x, param * (jnp.exp(x) - 1.0))
    if activation == "identity":
        return x
    raise ValueError(f"unknown activation {activation!r}")


class ABN(nn.Module):
    """Activated (optionally synchronized / renormalized) batch norm, NHWC."""

    features: int
    eps: float = 1e-5
    momentum: float = 0.1  # torch-style update rate
    activation: str = "leaky_relu"
    activation_param: float = 0.01
    axis_name: Optional[str] = None  # pmean stats over this mesh axis if set
    renorm: bool = False
    rmax: float = 3.0
    dmax: float = 5.0
    dtype: jnp.dtype = jnp.float32  # computation dtype for stats
    # fuse a trailing 3x3/2 maxpool into the same HBM pass (ResNet stem);
    # the full-resolution activated tensor then never exists in memory
    pool: bool = False
    # config-keyed kernel gates (network.fused_abn / network.fused_stem —
    # replace the round-2 BACS_FUSED_ABN / BACS_FUSED_STEM env vars)
    fused: bool = True
    fused_stem: bool = False

    def _unbiased_correction(self, x: Array) -> float:
        """n/(n-1) Bessel factor for the running-var update (torch and
        inplace_abn update running_var with the *unbiased* batch variance;
        normalization itself uses the biased one)."""
        n = x.size // x.shape[-1]
        if self.axis_name is not None and not self.is_initializing():
            n = n * jax.lax.axis_size(self.axis_name)
        return n / max(n - 1, 1)

    @nn.compact
    def __call__(self, x: Array, use_running_average: bool = False) -> Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )

        out_dtype = x.dtype

        # Fast path: fused in-place ABN (custom VJP recovers x̂ from the
        # output — zero extra activation memory; ops/abn_core.py).  Requires
        # an invertible activation, i.e. leaky_relu with slope > 0.
        # identity activation is leaky_relu with slope 1 — equally invertible,
        # so the residual-branch bn3/proj_bn layers ride the fused path too
        fusable_act = (
            self.activation == "leaky_relu" and self.activation_param > 0
        ) or self.activation == "identity"
        use_fused = (
            not use_running_average
            and not self.renorm
            and fusable_act
            and not self.is_initializing()
            and self.fused
        )
        if use_fused:
            from bacs_tpu.ops.abn_core import fused_abn
            from bacs_tpu.ops.stem_pool import fused_abn_pool

            slope = (
                self.activation_param if self.activation == "leaky_relu" else 1.0
            )
            if (
                self.pool
                and x.shape[1] % 2 == 0
                and x.shape[2] % 2 == 0
                # default OFF: isolated fwd+bwd is 2.4x faster than the
                # XLA-composed stem (4.9 vs 12 ms) but the full 512^2 train
                # step measures 216 vs 227 img/s with it on — the opaque
                # pallas calls schedule worse than XLA's interleaved
                # fusions in this HBM-bound step.  Flip on per-run
                # (network.fused_stem) to re-evaluate on other
                # shapes/hardware.
                and self.fused_stem
            ):
                y, mean, var = fused_abn_pool(
                    x, scale, bias, self.eps, slope, self.axis_name
                )
            else:
                y, mean, var = fused_abn(
                    x, scale, bias, self.eps, slope, self.axis_name
                )
                if self.pool:
                    y = nn.max_pool(
                        y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
                    )
            m = self.momentum
            corr = self._unbiased_correction(x)
            ra_mean.value = (1.0 - m) * ra_mean.value + m * jax.lax.stop_gradient(mean)
            ra_var.value = (1.0 - m) * ra_var.value + m * corr * jax.lax.stop_gradient(
                var
            )
            return y.astype(out_dtype)

        # reductions accumulate f32; elementwise math stays in x.dtype (an
        # up-front f32 cast would materialize a 2x activation copy in HBM)
        xf = x
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=reduce_axes, dtype=jnp.float32)
            mean_sq = jnp.mean(jnp.square(x), axis=reduce_axes, dtype=jnp.float32)
            if self.axis_name is not None and not self.is_initializing():
                # cross-replica sync: one fused pmean over (mean, mean_sq)
                mean, mean_sq = jax.lax.pmean(
                    (mean, mean_sq), axis_name=self.axis_name
                )
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                corr = self._unbiased_correction(x)
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * corr * var

        if self.renorm and not use_running_average:
            # batch renorm: normalize by batch stats, correct toward running
            # stats with clamped r/d (reference: networks/utils.py:600-655)
            sigma_b = jnp.sqrt(var + self.eps)
            sigma_r = jnp.sqrt(ra_var.value + self.eps)
            r = jax.lax.stop_gradient(
                jnp.clip(sigma_b / sigma_r, 1.0 / self.rmax, self.rmax)
            )
            d = jax.lax.stop_gradient(
                jnp.clip((mean - ra_mean.value) / sigma_r, -self.dmax, self.dmax)
            )
            a = (r / sigma_b * scale).astype(out_dtype)
            b = ((d - mean * r / sigma_b) * scale + bias).astype(out_dtype)
        else:
            inv = jax.lax.rsqrt(var + self.eps)
            a = (inv * scale).astype(out_dtype)
            b = (bias - mean * inv * scale).astype(out_dtype)
        y = xf * a + b
        y = _activate(y, self.activation, self.activation_param)
        if self.pool:
            y = nn.max_pool(
                y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
            )
        return y.astype(out_dtype)


def make_norm(
    norm: str,
    axis_name: Optional[str] = None,
    momentum: Optional[float] = None,
    sync: bool = False,
    fused: bool = True,
    fused_stem: bool = False,
) -> "type[nn.Module] | object":
    """Norm-layer factory mirroring the reference's norm selector strings.

    Returns a partial constructor `f(features) -> nn.Module`
    (reference: networks/deeplab_v3.py:71-100).  On TPU, all `*_sync`
    variants map onto the same ABN with an axis name; non-sync variants drop
    the axis (per-replica stats).
    """
    import functools

    cfg: dict = {}
    if norm == "bn":
        # reference `bn` branch always uses momentum 0.0003
        # (networks/deeplab_v3.py:72-75 BNReLUAct) and synchronized stats only
        # for the SDR atrous encoder (`use_sync_batch=use_atrous_encoder`)
        cfg = dict(
            activation="relu", activation_param=0.0, momentum=momentum or 0.0003
        )
        axis = axis_name if sync else None
    elif norm in ("iabn_sync", "abn_sync"):
        cfg = dict(activation="leaky_relu", activation_param=0.01)
        axis = axis_name
    elif norm in ("iabn", "abn"):
        cfg = dict(activation="leaky_relu", activation_param=0.01)
        axis = None
    elif norm in ("iabr_sync", "abr_sync"):
        cfg = dict(activation="leaky_relu", activation_param=0.01, renorm=True)
        axis = axis_name
    elif norm in ("iabr", "abr"):
        cfg = dict(activation="leaky_relu", activation_param=0.01, renorm=True)
        axis = None
    else:
        raise NotImplementedError(f"Selected Norm {norm} is not supported")
    if momentum is not None:
        cfg["momentum"] = momentum
    return functools.partial(
        ABN, axis_name=axis, fused=fused, fused_stem=fused_stem, **cfg
    )
