"""Fused upsample+argmax+conf (serving): parity with the composed ops."""

import jax
import jax.numpy as jnp
import numpy as np

from bacs_tpu.ops.interpolate import resize_bilinear
from bacs_tpu.ops.upsample_argmax import upsampled_argmax_conf


def _composed(sem, out_hw):
    up = resize_bilinear(sem.astype(jnp.float32), out_hw, align_corners=False)
    preds = jnp.argmax(up, axis=-1)
    conf = jnp.max(jax.nn.softmax(up, axis=-1), axis=-1)
    return np.asarray(preds), np.asarray(conf)


def test_matches_composed_resize_argmax(rng):
    sem = jnp.asarray(rng.randn(2, 8, 8, 5).astype(np.float32))
    preds, conf = upsampled_argmax_conf(sem, (32, 32))
    ref_p, ref_c = _composed(sem, (32, 32))
    assert preds.dtype == jnp.uint8 and conf.dtype == jnp.float16
    np.testing.assert_array_equal(np.asarray(preds), ref_p)
    np.testing.assert_allclose(np.asarray(conf), ref_c, atol=2e-3)


def test_identity_resolution_skips_resize(rng):
    """UNet-style heads emit at label resolution already."""
    sem = jnp.asarray(rng.randn(2, 16, 16, 4).astype(np.float32))
    preds, conf = upsampled_argmax_conf(sem, (16, 16))
    ref_p = np.argmax(np.asarray(sem), -1)
    np.testing.assert_array_equal(np.asarray(preds), ref_p)
    e = np.exp(np.asarray(sem) - np.asarray(sem).max(-1, keepdims=True))
    ref_c = (e.max(-1) / e.sum(-1))
    np.testing.assert_allclose(np.asarray(conf), ref_c, atol=2e-3)


def test_confidence_is_valid_probability(rng):
    sem = jnp.asarray((rng.randn(1, 8, 8, 21) * 5).astype(np.float32))
    _, conf = upsampled_argmax_conf(sem, (64, 64))
    c = np.asarray(conf, np.float32)
    assert (c >= 1.0 / 21 - 1e-3).all() and (c <= 1.0 + 1e-3).all()
