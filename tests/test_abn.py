"""Fused in-place ABN: value + gradient parity with the composed reference.

The inplace-ABN trick (backward from the OUTPUT only) must be numerically
identical to ordinary autodiff through batch-norm + leaky-relu
(reference semantics: inplace_abn CUDA extension, SURVEY §2.10).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from bacs_tpu.ops.abn_core import fused_abn, fused_abn_eval

EPS, SLOPE = 1e-5, 0.01


def _naive(x, scale, bias):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.maximum(jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - mean**2, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + EPS) * scale + bias
    return jnp.where(y >= 0, y, y * SLOPE), mean, var


@pytest.fixture()
def abn_data(rng):
    x = jnp.asarray(rng.randn(4, 6, 6, 8).astype(np.float32)) * 2 + 1
    scale = jnp.asarray(rng.rand(8).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(8).astype(np.float32))
    return x, scale, bias


def test_forward_matches_naive(abn_data):
    x, scale, bias = abn_data
    y, mean, var = fused_abn(x, scale, bias, EPS, SLOPE, None)
    y2, mean2, var2 = _naive(x, scale, bias)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var2), rtol=1e-5)


def test_gradients_match_autodiff(abn_data):
    x, scale, bias = abn_data

    def loss_fused(x, s, b):
        y, _, _ = fused_abn(x, s, b, EPS, SLOPE, None)
        return jnp.sum(jnp.sin(y) * y)

    def loss_naive(x, s, b):
        y, _, _ = _naive(x, s, b)
        return jnp.sum(jnp.sin(y) * y)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_naive, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )


def test_sync_gradients_match_global_batch(abn_data):
    """Sharded fused ABN (pmean stats + pmean backward reductions) must equal
    running the full batch on one device."""
    devices = jax.devices()
    if len(devices) < 4:
        pytest.skip("needs 4 virtual devices")
    x, scale, bias = abn_data
    mesh = Mesh(np.array(devices[:4]), ("data",))

    def loss(x, s, b, axis):
        y, _, _ = fused_abn(x, s, b, EPS, SLOPE, axis)
        return jnp.sum(jnp.square(y))

    g_full = jax.grad(loss)(x, scale, bias, None)

    def shard_loss(x, s, b):
        g = jax.grad(loss)(x, s, b, "data")
        return g

    g_shard = jax.jit(
        jax.shard_map(
            shard_loss, mesh=mesh, in_specs=(P("data"), P(), P()),
            out_specs=P("data"), check_vma=False,
        )
    )(x, scale, bias)
    np.testing.assert_allclose(
        np.asarray(g_shard), np.asarray(g_full), rtol=2e-4, atol=2e-5
    )


def test_eval_path(abn_data):
    x, scale, bias = abn_data
    mean = jnp.zeros((8,))
    var = jnp.ones((8,))
    y = fused_abn_eval(x, mean, var, scale, bias, EPS, SLOPE)
    ref = x * jax.lax.rsqrt(1.0 + EPS) * scale + bias
    ref = jnp.where(ref >= 0, ref, ref * SLOPE)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5, atol=1e-5)
