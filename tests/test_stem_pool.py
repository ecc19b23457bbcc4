"""Fused ABN+maxpool stem op: forward/gradient parity with the unfused ops.

The custom VJP in ops/stem_pool.py must match plain AD through
norm -> leaky_relu -> nn.max_pool exactly (up to dtype noise): the backward
reconstructs da from (p, dp, argmax) instead of a select-and-scatter.
"""

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from bacs_tpu.ops.stem_pool import fused_abn_pool
from bacs_tpu.models.norm import ABN


def _manual(c, scale, bias, eps=1e-5, slope=0.01):
    axes = tuple(range(c.ndim - 1))
    mean = jnp.mean(c, axis=axes, dtype=jnp.float32)
    var = jnp.maximum(
        jnp.mean(jnp.square(c), axis=axes, dtype=jnp.float32)
        - jnp.square(mean),
        0.0,
    )
    inv = jax.lax.rsqrt(var + eps)
    y = (c - mean) * (inv * scale) + bias
    y = jnp.where(y >= 0, y, y * slope)
    p = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    return p, mean, var


def test_forward_matches_unfused():
    rng = np.random.RandomState(0)
    c = jnp.asarray(rng.randn(2, 16, 20, 8).astype(np.float32))
    scale = jnp.asarray(rng.rand(8).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(8).astype(np.float32) * 0.1)
    p1, m1, v1 = fused_abn_pool(c, scale, bias)
    p2, m2, v2 = _manual(c, scale, bias)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)


def test_forward_negative_scale():
    # affine with negative scale flips ordering pre-activation; the pool
    # happens after activation so results must still agree with the
    # unfused composition
    rng = np.random.RandomState(1)
    c = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    scale = jnp.asarray(np.array([-1.0, 0.7, -0.3, 2.0], np.float32))
    bias = jnp.zeros((4,), jnp.float32)
    p1, _, _ = fused_abn_pool(c, scale, bias)
    p2, _, _ = _manual(c, scale, bias)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)


def test_gradients_match_plain_ad():
    rng = np.random.RandomState(2)
    c = jnp.asarray(rng.randn(2, 12, 16, 8).astype(np.float32))
    scale = jnp.asarray(rng.rand(8).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(8).astype(np.float32) * 0.1)
    w = jnp.asarray(rng.randn(2, 6, 8, 8).astype(np.float32))

    def loss_fused(c, scale, bias):
        p, _, _ = fused_abn_pool(c, scale, bias)
        return jnp.sum(p * w) + jnp.sum(jnp.square(p))

    def loss_manual(c, scale, bias):
        p, _, _ = _manual(c, scale, bias)
        return jnp.sum(p * w) + jnp.sum(jnp.square(p))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(c, scale, bias)
    g2 = jax.grad(loss_manual, argnums=(0, 1, 2))(c, scale, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        )


def test_abn_module_pool_fused_vs_standard():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    mod = ABN(features=8, pool=True, fused=False)
    variables = mod.init(jax.random.PRNGKey(0), x)

    y_std, mut_std = mod.apply(variables, x, mutable=["batch_stats"])
    # config-keyed gates (fused_stem defaults off in-step)
    mod_fused = ABN(features=8, pool=True, fused=True, fused_stem=True)
    y_fused, mut_fused = mod_fused.apply(variables, x, mutable=["batch_stats"])

    assert y_fused.shape == (2, 8, 8, 8)
    np.testing.assert_allclose(
        np.asarray(y_std), np.asarray(y_fused), atol=1e-5
    )
    for k in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(mut_std["batch_stats"][k]),
            np.asarray(mut_fused["batch_stats"][k]),
            atol=1e-5,
        )


def test_abn_module_pool_eval_mode():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    mod = ABN(features=8, pool=True)
    variables = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(variables, x, use_running_average=True)
    # eval normalizes with running stats then pools
    inv = jax.lax.rsqrt(variables["batch_stats"]["var"] + 1e-5)
    yy = (x - variables["batch_stats"]["mean"]) * (
        inv * variables["params"]["scale"]
    ) + variables["params"]["bias"]
    yy = jnp.where(yy >= 0, yy, yy * 0.01)
    ref = nn.max_pool(yy, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4)


def test_odd_spatial_falls_back():
    # odd H keeps the unfused path (fused kernel needs even H, W)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 15, 16, 4).astype(np.float32))
    mod = ABN(features=4, pool=True)
    variables = mod.init(jax.random.PRNGKey(0), x)
    y, _ = mod.apply(variables, x, mutable=["batch_stats"])
    assert y.shape == (1, 8, 8, 4)
