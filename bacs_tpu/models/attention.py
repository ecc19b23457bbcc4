"""SimAM: parameter-free attention (reference: networks/attention.py:5-33).

Unused by the default configs (as in the reference) but part of the network
inventory: e = ((x - mu)^2) / (4 * (var + lambda)) + 0.5; out = x * sigmoid(e).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class SimAM(nn.Module):
    e_lambda: float = 1e-4

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n = x.shape[1] * x.shape[2] - 1
        mu = jnp.mean(x, axis=(1, 2), keepdims=True)
        x_mu_sq = jnp.square(x - mu)
        var = jnp.sum(x_mu_sq, axis=(1, 2), keepdims=True) / n
        e = x_mu_sq / (4.0 * (var + self.e_lambda)) + 0.5
        return x * jax.nn.sigmoid(e)
