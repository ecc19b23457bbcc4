"""On-device fused augmentation: crop/flip/normalize/label-remap in one jit.

TPU-native replacement for the reference's torchvision CPU transforms
(reference: dataloaders/voc_datamodule.py:15-30 — RandomResizedCrop(crop,
(0.5, 2.0)) + HFlip + ToTensor + Normalize(ImageNet); test path Resize +
CenterCrop): the host only decodes to fixed-size uint8 arrays, everything
else happens on device in one fused kernel per batch, so augmentation rides
HBM bandwidth instead of the (single-core) host.

Label remapping is a 256-entry gather table built per task by the scenario
(reference applies TransformLabel per label tensor on CPU,
training/utils.py:225-261).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_image(img: Array) -> Array:
    """uint8 [..., 3] → normalized float32."""
    x = img.astype(jnp.float32) / 255.0
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (x - mean) / std


def denormalize_image(x: Array) -> Array:
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return jnp.clip((x * std + mean) * 255.0, 0, 255).astype(jnp.uint8)


def remap_labels(labels: Array, table: Array) -> Array:
    """Apply a [256] lookup table to integer labels."""
    return table[jnp.clip(labels.astype(jnp.int32), 0, 255)]


def _sample_crop_params(rng, src_hw, crop: int, scale=(0.5, 2.0), ratio=(3 / 4, 4 / 3)):
    """RandomResizedCrop region in source coords (torchvision semantics:
    sample target area = scale·src_area and aspect ratio, 10 tries collapsed
    into clamping — adequate on fixed-size sources)."""
    h, w = src_hw
    r_area, r_ratio, r_i, r_j = jax.random.split(rng, 4)
    area = h * w * jax.random.uniform(r_area, minval=scale[0], maxval=scale[1])
    log_ratio = jax.random.uniform(
        r_ratio, minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_ratio)
    cw = jnp.clip(jnp.sqrt(area * aspect), 8.0, w)
    ch = jnp.clip(jnp.sqrt(area / aspect), 8.0, h)
    i = jax.random.uniform(r_i) * (h - ch)
    j = jax.random.uniform(r_j) * (w - cw)
    return i, j, ch, cw


def _resize_region(img, i, j, ch, cw, out: int, method: str):
    """Sample an out×out grid from the region [i:i+ch, j:j+cw] (gather)."""
    h, w = img.shape[0], img.shape[1]
    if method == "nearest":
        ys = jnp.clip((i + (jnp.arange(out) + 0.0) * ch / out), 0, h - 1)
        xs = jnp.clip((j + (jnp.arange(out) + 0.0) * cw / out), 0, w - 1)
        yi = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
        xi = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
        return img[yi][:, xi]
    # bilinear with half-pixel centers
    ys = jnp.clip(i + (jnp.arange(out) + 0.5) * ch / out - 0.5, 0, h - 1)
    xs = jnp.clip(j + (jnp.arange(out) + 0.5) * cw / out - 0.5, 0, w - 1)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    f = img.astype(jnp.float32)
    top = f[y0][:, x0] * (1 - wx) + f[y0][:, x1] * wx
    bot = f[y1][:, x0] * (1 - wx) + f[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def _augment_one(rng, img, lbl, crop: int, scale):
    r_crop, r_flip = jax.random.split(rng)
    i, j, ch, cw = _sample_crop_params(r_crop, img.shape[:2], crop, scale)
    img_c = _resize_region(img, i, j, ch, cw, crop, "bilinear")
    lbl_c = _resize_region(lbl, i, j, ch, cw, crop, "nearest")
    flip = jax.random.bernoulli(r_flip)
    img_c = jnp.where(flip, img_c[:, ::-1, :], img_c)
    lbl_c = jnp.where(flip, lbl_c[:, ::-1], lbl_c)
    return img_c, lbl_c


@partial(jax.jit, static_argnames=("crop", "scale"))
def train_transform(
    rng: Array,
    images: Array,
    labels: Array,
    table: Array,
    crop: int = 512,
    scale: Tuple[float, float] = (0.5, 2.0),
):
    """[N,H,W,3] uint8 + [N,H,W] labels → augmented normalized batch."""
    rngs = jax.random.split(rng, images.shape[0])
    img_c, lbl_c = jax.vmap(
        lambda r, im, lb: _augment_one(r, im, lb, crop, scale)
    )(rngs, images, labels)
    return {
        "image": normalize_image(img_c),
        "label": remap_labels(lbl_c, table),
    }


@jax.jit
def replay_augment(rng: Array, images: Array, labels: Array):
    """Re-augment buffered batches at replay time.

    The reference re-applies the full train transform (RandomResizedCrop
    (0.5,2.0) + HFlip) to buffered samples every time they are replayed
    (reference: dataloaders/base_datamodule.py:433-451 get_buffer_loader
    passes train_transform).  Buffered images here are canonical normalized
    crops already resident in HBM, so the crop/flip is applied to the stored
    crop directly (no host round-trip); labels get the same spatial params.
    """
    crop = images.shape[1]
    rngs = jax.random.split(rng, images.shape[0])

    def one(r, img, lbl):
        return _augment_one(r, img, lbl, crop, (0.5, 2.0))

    return jax.vmap(one)(rngs, images, labels)


@partial(jax.jit, static_argnames=("crop",))
def eval_transform(images: Array, labels: Array, table: Array, crop: int = 512):
    """Resize(short side→crop) + CenterCrop + Normalize (reference test
    transforms, voc_datamodule.py:24-30). Sources arrive pre-sized square, so
    this is a straight resize."""
    n, h, w, _ = images.shape
    if (h, w) != (crop, crop):
        images = jax.image.resize(
            images.astype(jnp.float32), (n, crop, crop, 3), "linear"
        )
        ys = jnp.clip(
            jnp.floor(jnp.arange(crop) * (h / crop)).astype(jnp.int32), 0, h - 1
        )
        xs = jnp.clip(
            jnp.floor(jnp.arange(crop) * (w / crop)).astype(jnp.int32), 0, w - 1
        )
        labels = labels[:, ys][:, :, xs]
    return {
        "image": normalize_image(images),
        "label": remap_labels(labels, table),
    }
