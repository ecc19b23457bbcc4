"""Transformer decoder blocks for TranSeg, Flax.

Redesign of the reference's timm-style blocks
(reference: networks/layers.py:16-95): pre-LN MHSA + GELU MLP with DropPath.
Token count is ~1k patches + ≤num_classes class tokens, so plain quadratic
attention maps cleanly onto the MXU (SURVEY.md §5 — no sequence-parallel
machinery needed).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class Attention(nn.Module):
    dim: int
    heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        b, n, c = x.shape
        head_dim = self.dim // self.heads
        qkv = nn.Dense(self.dim * 3, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [b, n, h, d]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (head_dim**-0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        y = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        y = nn.Dense(self.dim, dtype=self.dtype, name="proj")(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return y


class Block(nn.Module):
    dim: int
    heads: int
    mlp_dim: int
    dropout: float = 0.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)  # torch LN eps
        y = Attention(self.dim, self.heads, self.dropout, self.dtype, name="attn")(
            y, train=train
        )
        x = x + _drop_path(y, self.drop_path, self, train)
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(self.mlp_dim, dtype=self.dtype, name="mlp_fc1")(y)
        # exact erf GELU (torch nn.GELU default; flax defaults to tanh approx)
        y = nn.gelu(y, approximate=False)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return x + _drop_path(y, self.drop_path, self, train)


def _drop_path(x: Array, rate: float, module: nn.Module, train: bool) -> Array:
    """Stochastic depth (reference: networks/utils.py DropPath)."""
    if rate == 0.0 or not train:
        return x
    rng = module.make_rng("dropout")
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * mask / keep
