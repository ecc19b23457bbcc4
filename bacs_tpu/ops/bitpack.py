"""Device-side bit-packing of class-id masks for the serving wire format.

Serving over the device→host link is bandwidth-bound (docs/RESULTS.md:
the tunnel moves ~30 MB/s while the device-side forward is 22.8 ms),
so every payload byte is latency. Class ids need only
``ceil(log2(n_classes))`` bits — 5 for VOC's 21 classes — and packing
them on device cuts the mask payload by ``1 - bits/8`` before it ever
touches the link.

Wire format — chosen for TPU layout, not byte-stream convention (we own
both ends): **byte-planes over H-groups**. Pixels are grouped 8 along H
(the sublane axis); plane ``b`` holds, for group row ``g`` and column
``w``, the byte whose bit ``k`` is bit ``b`` of pixel ``(8g+k, w)``.
The packed array is ``[N, bits, H/8, W]`` flattened to ``[N, -1]``.
W stays the minor (lane) axis at full width through every op, so the
pack is a handful of full-lane uint8 shifts on the VPU. A first
formulation that regrouped bits with ``[..., 8, bits]`` trailing dims
measured 60 ms on a v5e at 512²b16 — tiny trailing dims pad to the
128-lane tile and the relayout dominates; this planar form is <2 ms.
The unpack is ``np.unpackbits(axis=H, bitorder="little")`` per plane
plus a weighted sum on host.

The reference has no serving path at all (training-only research code);
this is part of the deployment story built on top of it.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def bits_needed(n_classes: int) -> int:
    """Smallest bits-per-pixel that can hold class ids 0..n_classes-1."""
    if not 2 <= n_classes <= 256:
        raise ValueError(f"n_classes must be in [2, 256], got {n_classes}")
    return max(1, math.ceil(math.log2(n_classes)))


def pack_bits(preds: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Pack uint8 class ids [N, H, W] → packed bytes [N, bits*H*W//8].

    Requires H % 8 == 0. Runs on device (jnp) so only the packed bytes
    cross the link; all ops keep W on the lane axis (see module doc).
    """
    if not 1 <= bits <= 8:
        raise ValueError(f"bits must be in [1, 8], got {bits}")
    n, h, w = preds.shape
    if h % 8:
        raise ValueError(f"H must be divisible by 8, got {h}")
    v = preds.astype(jnp.uint8).reshape(n, h // 8, 8, w)
    slabs = [v[:, :, k, :] for k in range(8)]  # 8 × [N, H/8, W]
    one = jnp.uint8(1)
    planes = [
        sum(((slabs[k] >> jnp.uint8(b)) & one) << jnp.uint8(k)
            for k in range(8))
        for b in range(bits)
    ]
    return jnp.stack(planes, axis=1).reshape(n, -1)  # [N, bits*H/8*W]


def unpack_bits(packed: np.ndarray, shape: tuple, bits: int) -> np.ndarray:
    """Host-side inverse of :func:`pack_bits`.

    packed: uint8 [N, bits*H*W//8]; shape: the original (N, H, W).
    """
    from bacs_tpu.data.native import unpack_bitplanes

    n, h, w = shape
    planes = np.asarray(packed, np.uint8).reshape(n, bits, h // 8, w)
    native = unpack_bitplanes(planes, n, bits, h // 8, w)
    if native is not None:  # ~10x the numpy path on a 1-core host
        return native
    # byte at (g, w) expands LSB-first to pixels (8g+k, w), k = 0..7
    plane_bits = np.unpackbits(planes, axis=2, bitorder="little")
    out = np.zeros((n, h, w), np.uint8)
    for b in range(bits):
        out |= plane_bits[:, b] << b
    return out
