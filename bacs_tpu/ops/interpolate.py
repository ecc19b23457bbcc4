"""Resize primitives matching torch F.interpolate semantics, NHWC.

The reference uses three interpolation flavours that all affect mIoU parity
(SURVEY.md §7 risks):
- bilinear align_corners=False for logit upsampling
  (reference: networks/deeplab_v3.py:158-160)
- bilinear align_corners=True for the BgDetector's ×16 upsample
  (reference: networks/bg_detector.py:13-15)
- nearest for label downsampling in prototype extraction
  (reference: loss/prototypes.py:177-205)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def resize_bilinear(
    x: Array, size: tuple[int, int], align_corners: bool = False
) -> Array:
    """Bilinear resize of [N, H, W, C] to [N, size[0], size[1], C]."""
    n, h, w, c = x.shape
    oh, ow = size
    if (h, w) == (oh, ow):
        return x
    if not align_corners:
        # half-pixel centers == torch align_corners=False == jax.image default
        return jax.image.resize(x, (n, oh, ow, c), method="linear")
    # align_corners=True: src = i * (in-1)/(out-1)
    dtype = x.dtype
    xf = x.astype(jnp.float32)

    def _coords(out_dim, in_dim):
        if out_dim == 1:
            return jnp.zeros((1,), jnp.float32)
        scale = (in_dim - 1) / (out_dim - 1)
        return jnp.arange(out_dim, dtype=jnp.float32) * scale

    ys = _coords(oh, h)
    xs = _coords(ow, w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0.astype(jnp.float32))[None, :, None, None]
    wx = (xs - x0.astype(jnp.float32))[None, None, :, None]

    top = xf[:, y0][:, :, x0] * (1 - wx) + xf[:, y0][:, :, x1] * wx
    bot = xf[:, y1][:, :, x0] * (1 - wx) + xf[:, y1][:, :, x1] * wx
    out = top * (1 - wy) + bot * wy
    return out.astype(dtype)


def resize_nearest(x: Array, size: tuple[int, int]) -> Array:
    """Nearest-neighbour resize matching torch F.interpolate(mode="nearest").

    Works for [N, H, W] label maps and [N, H, W, C] tensors.
    torch nearest: src_idx = floor(dst_idx * in/out).
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[..., None]
    n, h, w, c = x.shape
    oh, ow = size
    if (h, w) != (oh, ow):
        ys = jnp.clip(
            jnp.floor(jnp.arange(oh, dtype=jnp.float32) * (h / oh)).astype(jnp.int32),
            0,
            h - 1,
        )
        xs = jnp.clip(
            jnp.floor(jnp.arange(ow, dtype=jnp.float32) * (w / ow)).astype(jnp.int32),
            0,
            w - 1,
        )
        x = x[:, ys][:, :, xs]
    return x[..., 0] if squeeze else x
