"""HBM-resident fixed-shape reservoir replay buffer, pure jnp.

TPU-native redesign of the reference's disk-memmap Buffer
(reference: training/buffer.py:96-398): instead of np.memmap files streamed
through a second DataLoader, the buffer is preallocated device arrays inside
the train-state pytree; add/sample are jitted pure functions, so replay
batches never leave HBM (SURVEY.md §7 north star).

Semantics preserved from the reference:
- reservoir with score-weighted eviction: once full, a new item displaces a
  slot drawn from softmax-normalized ``0.3·normalized importance +
  0.7·class-balance`` scores (reference: buffer.py:138-172 functionalReservoir
  + merge_scores); balance score of a slot = min class frequency among its
  non-bg labels.  The reference counts the ignore label (255) like any other
  class in that balance min — ``merge_scores`` only skips label 0
  (buffer.py:141-146, 246-252) — so ``label_mask``/``class_counts`` carry an
  extra trailing column for it.
- random draws are consumed as uniform [0,1) deviates: inverse-CDF
  searchsorted matches ``np.random.choice(p=scores)`` exactly, while
  ``floor(u·N)`` for randint is NOT numpy's transformation (RandomState
  uses masked rejection) — the boundary-parity harness therefore patches
  the reference side to the same floor transform so both consume one
  injected stream and eviction decisions can be compared bit-for-bit
  (tests/test_boundary_parity.py); against unpatched numpy the randint
  draws differ (same distribution, different deviates).
- per-slot stored fields: image, pre-upsample sem logits (padded to the FINAL
  class count up front — replacing `change_data_size` memmap surgery,
  buffer.py:63-93), labels, importance (−loss), task id, per-class label
  bitmask, and the class count valid at store time (`_logits_n_classes`).
- uniform or same-task sampling (reference: buffer.py:305-344).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array

NEG_INF = -jnp.inf


@struct.dataclass
class BufferState:
    images: Array  # [B, H, W, 3] (storage dtype, e.g. bf16 normalized)
    logits: Array  # [B, h, w, C_total] bf16
    labels: Array  # [B, H, W] uint8 (labels/ignore <= 255; int32 at read)
    importance: Array  # [B] f32 (−loss; −inf = unset)
    label_mask: Array  # [B, C_total+1] bool — classes present per slot
    # (column C_total tracks the ignore label, mirroring the reference)
    task_ids: Array  # [B] int32
    n_classes: Array  # [B] int32 — class count when the logits were stored
    valid: Array  # [B] bool
    class_counts: Array  # [C_total+1] i32 — occurrences of each class in buffer
    num_seen: Array  # i32 scalar — reservoir N

    @property
    def size(self) -> int:
        return self.images.shape[0]


def _encode_image(img, dtype):
    """Normalized float image → buffer storage dtype.

    ``uint8`` storage is LOSSLESS for canonical (non-augmented) buffer
    images: they originate as uint8 pixels, and normalize/denormalize is
    an exact affine round-trip on that grid — unlike bf16, which quantizes
    the normalized values.  Halves the image bytes of the HBM buffer
    (buffer 300 × 512²: 472 → 236 MB)."""
    if jnp.dtype(dtype) == jnp.uint8:
        from bacs_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

        x = img * jnp.asarray(IMAGENET_STD) + jnp.asarray(IMAGENET_MEAN)
        # round, not truncate: float error on exact grid points must not
        # drop a pixel level
        return jnp.round(jnp.clip(x * 255.0, 0, 255)).astype(jnp.uint8)
    return img.astype(dtype)


def _decode_image(img):
    if img.dtype == jnp.uint8:
        from bacs_tpu.data.transforms import normalize_image

        return normalize_image(img)
    return img.astype(jnp.float32)


def init_buffer(
    buffer_size: int,
    image_hw: tuple[int, int],
    logit_hw: tuple[int, int],
    num_classes: int,
    image_dtype: Any = jnp.bfloat16,
    logit_dtype: Any = jnp.bfloat16,
) -> BufferState:
    h, w = image_hw
    lh, lw = logit_hw
    return BufferState(
        images=jnp.zeros((buffer_size, h, w, 3), image_dtype),
        logits=jnp.zeros((buffer_size, lh, lw, num_classes), logit_dtype),
        labels=jnp.zeros((buffer_size, h, w), jnp.uint8),
        importance=jnp.full((buffer_size,), NEG_INF, jnp.float32),
        label_mask=jnp.zeros((buffer_size, num_classes + 1), bool),
        task_ids=jnp.zeros((buffer_size,), jnp.int32),
        n_classes=jnp.zeros((buffer_size,), jnp.int32),
        valid=jnp.zeros((buffer_size,), bool),
        class_counts=jnp.zeros((num_classes + 1,), jnp.int32),
        num_seen=jnp.zeros((), jnp.int32),
    )


def _eviction_scores(buf: BufferState) -> Array:
    """Softmax-style eviction distribution (reference: buffer.py:145-163).

    balance score = min class count among a slot's non-bg classes (the
    ignore-label column participates, like the reference's labels dict);
    importance normalized by mean(|imp|)·mean(|bal|); blended 0.3/0.7 then
    min-max normalized to a probability vector over slots.
    """
    counts = buf.class_counts.astype(jnp.float32)
    # min over classes present (excluding bg=0); empty → large value
    masked = jnp.where(
        buf.label_mask.at[:, 0].set(False), counts[None, :], jnp.inf
    )
    balance = jnp.min(masked, axis=1)
    balance = jnp.where(jnp.isfinite(balance), balance, 0.0)

    imp = buf.importance
    imp_finite = jnp.where(jnp.isfinite(imp), imp, 0.0)
    scaling = jnp.mean(jnp.abs(imp_finite)) * jnp.mean(jnp.abs(balance))
    norm_imp = imp_finite / jnp.maximum(scaling, 1e-8)
    pre = 0.3 * norm_imp + 0.7 * balance
    rng_span = jnp.max(pre) - jnp.min(pre)
    pre = jnp.where(rng_span > 0, (pre - jnp.min(pre)) / jnp.maximum(rng_span, 1e-8), pre)
    total = jnp.sum(pre)
    return jnp.where(total > 0, pre / jnp.maximum(total, 1e-8), jnp.full_like(pre, 1.0 / pre.shape[0]))


def add_batch(
    buf: BufferState,
    rng: Array,
    images: Array,
    logits: Array,
    labels: Array,
    losses: Array,
    task_id: int | Array,
    n_classes: int | Array,
    ignore_index: int = 255,
    uniforms: Optional[Tuple[Array, Array]] = None,
) -> BufferState:
    """Reservoir-add a batch of samples (scan over items, pure).

    `logits` must already be padded to the buffer's full class width.
    `uniforms`, if given, is a pair of [N_items] uniform-[0,1) arrays
    (reservoir draw, eviction draw) consumed instead of `rng` — the
    transformations below (``floor(u·N)``, inverse-CDF over the eviction
    scores) match numpy's ``randint`` / ``choice(p=…)`` exactly, so a shared
    stream reproduces the reference Buffer's decisions (buffer.py:164-172).
    """
    m = buf.size
    n_cols = buf.class_counts.shape[0]  # num_classes + 1 (ignore column)
    n_items = images.shape[0]
    if uniforms is None:
        k1, k2 = jax.random.split(rng)
        u_res = jax.random.uniform(k1, (n_items,))
        u_evict = jax.random.uniform(k2, (n_items,))
    else:
        u_res, u_evict = uniforms

    # label bookkeeping uses the BATCH-wide unique-label set for every item
    # (reference quirk: add_data reads `dict_data["labels"].unique()` — the
    # whole batch tensor — inside the per-item loop, buffer.py:240-252)
    ext_all = jnp.where(labels == ignore_index, n_cols - 1, labels)
    batch_mask = jnp.zeros((n_cols,), bool).at[ext_all.reshape(-1)].set(True)

    def add_one(buf, item):
        img, lgt, lbl, loss, ur, ue = item
        n = buf.num_seen
        # reservoir decision (reference: buffer.py:164-172): rn ~ randint(0,N)
        rn = jnp.floor(ur * jnp.maximum(n, 1).astype(jnp.float32)).astype(
            jnp.int32
        )
        scores = _eviction_scores(buf)
        cdf = jnp.cumsum(scores)
        cdf = cdf / jnp.maximum(cdf[-1], 1e-30)
        evict_idx = jnp.minimum(
            jnp.searchsorted(cdf, ue, side="right"), m - 1
        ).astype(jnp.int32)
        idx = jnp.where(n < m, n, jnp.where(rn < m, evict_idx, -1))

        def write(buf):
            # class bookkeeping: pop old slot labels, push new.  The ignore
            # label maps to the extra trailing column — the reference tracks
            # 255 like a class (buffer.py:246-252 counts every non-zero
            # unique label).
            new_mask = batch_mask
            old_mask = jnp.where(buf.valid[idx], buf.label_mask[idx], False)
            counts = (
                buf.class_counts
                - old_mask.astype(jnp.int32)
                + new_mask.astype(jnp.int32)
            )
            counts = counts.at[0].set(0)  # bg not tracked (reference skips 0)
            return buf.replace(
                images=buf.images.at[idx].set(_encode_image(img, buf.images.dtype)),
                logits=buf.logits.at[idx].set(lgt.astype(buf.logits.dtype)),
                labels=buf.labels.at[idx].set(lbl.astype(jnp.uint8)),
                importance=buf.importance.at[idx].set(loss),
                label_mask=buf.label_mask.at[idx].set(new_mask),
                task_ids=buf.task_ids.at[idx].set(jnp.asarray(task_id, jnp.int32)),
                n_classes=buf.n_classes.at[idx].set(
                    jnp.asarray(n_classes, jnp.int32)
                ),
                valid=buf.valid.at[idx].set(True),
                class_counts=counts,
            )

        buf = jax.lax.cond(idx >= 0, write, lambda b: b, buf)
        buf = buf.replace(num_seen=buf.num_seen + 1)
        return buf, None

    buf, _ = jax.lax.scan(
        add_one, buf, (images, logits, labels, losses, u_res, u_evict)
    )
    return buf


def sample(
    buf: BufferState,
    rng: Array,
    batch_size: int,
    task_id: Optional[Array] = None,
) -> dict[str, Array]:
    """Sample a replay batch; uniform over valid slots (or one task's slots).

    (reference: buffer.py:305-344 `_sample_indices` — uniform without
    replacement; we sample by perturbed top-k over valid slots which is
    equivalent without-replacement sampling under jit.)
    """
    eligible = buf.valid
    if task_id is not None:
        eligible = eligible & (buf.task_ids == task_id)
    # Gumbel-top-k = uniform sampling without replacement over eligible slots
    g = jax.random.gumbel(rng, (buf.size,))
    keys = jnp.where(eligible, g, -jnp.inf)
    _, idx = jax.lax.top_k(keys, batch_size)
    return {
        "images": _decode_image(buf.images[idx]),
        "logits": buf.logits[idx].astype(jnp.float32),
        "labels": buf.labels[idx].astype(jnp.int32),
        "n_classes": buf.n_classes[idx],
        "indices": idx,
    }
