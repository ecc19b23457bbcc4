"""Fused upsample+CE: value and gradient parity with the composed ops."""

import jax
import jax.numpy as jnp
import numpy as np

from bacs_tpu.ops.interpolate import resize_bilinear
from bacs_tpu.ops.losses import cross_entropy
from bacs_tpu.ops.upsample_ce import upsampled_cross_entropy


def _composed(sem, labels, out_hw):
    up = resize_bilinear(sem.astype(jnp.float32), out_hw, align_corners=False)
    return cross_entropy(up, labels, 255)


def test_value_matches_composed(rng):
    sem = jnp.asarray(rng.randn(2, 8, 8, 5).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 5, (2, 32, 32)).astype(np.int32))
    labels = labels.at[0, :4].set(255)
    fused = upsampled_cross_entropy(sem, labels, (32, 32), 255)
    ref = _composed(sem, labels, (32, 32))
    np.testing.assert_allclose(float(fused), float(ref), rtol=1e-5)


def test_gradient_matches_composed(rng):
    sem = jnp.asarray(rng.randn(2, 8, 8, 5).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 5, (2, 32, 32)).astype(np.int32))
    g1 = jax.grad(
        lambda s: upsampled_cross_entropy(s, labels, (32, 32), 255)
    )(sem)
    g2 = jax.grad(lambda s: _composed(s, labels, (32, 32)))(sem)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4,
                               atol=1e-6)


def test_identity_size(rng):
    sem = jnp.asarray(rng.randn(1, 16, 16, 4).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 4, (1, 16, 16)).astype(np.int32))
    fused = upsampled_cross_entropy(sem, labels, (16, 16), 255)
    ref = cross_entropy(sem, labels, 255)
    np.testing.assert_allclose(float(fused), float(ref), rtol=1e-5)


def test_weighted_value_and_grad_match_composed(rng):
    """Per-class-weighted variant: torch weighted-mean semantics
    (sum w[y]*nll / sum w[y]) + gradient parity."""
    from bacs_tpu.ops.upsample_ce import upsampled_weighted_cross_entropy

    sem = jnp.asarray(rng.randn(2, 8, 8, 5).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 5, (2, 32, 32)).astype(np.int32))
    labels = labels.at[0, :4].set(255)
    w = jnp.asarray(np.array([0.0, 1.0, 1.0, 0.5, 0.0], np.float32))

    def composed(s):
        up = resize_bilinear(s.astype(jnp.float32), (32, 32),
                             align_corners=False)
        return cross_entropy(up, labels, 255, class_weights=w)

    fused = upsampled_weighted_cross_entropy(sem, labels, w, (32, 32), 255)
    np.testing.assert_allclose(float(fused), float(composed(sem)), rtol=1e-5)
    g1 = jax.grad(
        lambda s: upsampled_weighted_cross_entropy(s, labels, w, (32, 32), 255)
    )(sem)
    g2 = jax.grad(composed)(sem)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4,
                               atol=1e-6)


def test_upsampled_confusion_matches_composed(rng):
    from bacs_tpu.ops.upsample_confusion import upsampled_confusion, _conf_jnp

    sem = jnp.asarray(rng.randn(2, 8, 8, 5).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 6, (2, 32, 32)).astype(np.int32))
    labels = labels.at[0, 0].set(255)
    cm = upsampled_confusion(sem, labels, (32, 32), 6, 255)
    ref = _conf_jnp(sem, labels, (32, 32), 6, 255)
    np.testing.assert_array_equal(np.asarray(cm), np.asarray(ref))
    assert int(np.asarray(cm).sum()) == 2 * 32 * 32 - 32 - int(
        (np.asarray(labels) == 255).sum() - 32
    )


def test_unbiased_ce_value_and_grad_match_composed(rng):
    """MiB UCE variant vs resize + ops/losses.unbiased_cross_entropy."""
    from bacs_tpu.ops.losses import unbiased_cross_entropy
    from bacs_tpu.ops.upsample_ce import upsampled_unbiased_cross_entropy

    OLD = 3
    sem = jnp.asarray(rng.randn(2, 8, 8, 6).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 6, (2, 32, 32)).astype(np.int32))
    labels = labels.at[0, :4].set(255)
    labels = labels.at[1, :6].set(1)  # exercise the collapsed-old branch

    def composed(s):
        up = resize_bilinear(s.astype(jnp.float32), (32, 32),
                             align_corners=False)
        return unbiased_cross_entropy(up, labels, OLD, 255)

    fused = upsampled_unbiased_cross_entropy(sem, labels, (32, 32), OLD, 255)
    np.testing.assert_allclose(float(fused), float(composed(sem)), rtol=1e-5)
    g1 = jax.grad(
        lambda s: upsampled_unbiased_cross_entropy(s, labels, (32, 32), OLD,
                                                   255)
    )(sem)
    g2 = jax.grad(composed)(sem)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4,
                               atol=1e-6)


def test_unbiased_kd_value_and_grad_match_composed(rng):
    """MiB UKD variant vs resize-both + unbiased_knowledge_distillation;
    the teacher cotangent must be hard zero (KD detaches the old model)."""
    from bacs_tpu.ops.losses import unbiased_knowledge_distillation
    from bacs_tpu.ops.upsample_ce import upsampled_unbiased_kd

    OLD = 4
    sem_new = jnp.asarray(rng.randn(2, 8, 8, 6).astype(np.float32))
    sem_old = jnp.asarray(rng.randn(2, 8, 8, OLD).astype(np.float32))

    def composed(sn):
        up_n = resize_bilinear(sn.astype(jnp.float32), (32, 32),
                               align_corners=False)
        up_o = resize_bilinear(sem_old.astype(jnp.float32), (32, 32),
                               align_corners=False)
        return unbiased_knowledge_distillation(up_n, up_o, alpha=1.0)

    fused = upsampled_unbiased_kd(sem_new, sem_old, (32, 32), alpha=1.0)
    np.testing.assert_allclose(float(fused), float(composed(sem_new)),
                               rtol=1e-5)
    g1, g_old = jax.grad(
        lambda sn, so: upsampled_unbiased_kd(sn, so, (32, 32), 1.0),
        argnums=(0, 1),
    )(sem_new, sem_old)
    g2 = jax.grad(composed)(sem_new)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(g_old), 0.0, atol=0.0)


def test_uce_terms_match_autodiff(rng):
    """The hand-derived per-pixel loss/grad of the UCE kernel
    (ops/upsample_ce._uce_terms) vs autodiff through the golden formula."""
    from bacs_tpu.ops.losses import unbiased_cross_entropy
    from bacs_tpu.ops.upsample_ce import NEG, _uce_terms

    R, C, W, OLD = 4, 7, 8, 5
    tile = jnp.asarray(rng.randn(R, C, W).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, C, (R, W)).astype(np.int32))
    labels = labels.at[0, :2].set(255)
    labels = labels.at[1, :4].set(0)
    c_pad = 8
    tile_p = jnp.pad(tile, ((0, 0), (0, c_pad - C), (0, 0)),
                     constant_values=NEG)

    def composed(t):
        x = jnp.transpose(t, (0, 2, 1))[None]
        return unbiased_cross_entropy(
            x, labels[None], OLD, 255, reduction="none"
        ).sum()

    loss_map, grad = _uce_terms(tile_p, labels, OLD)
    np.testing.assert_allclose(float(jnp.sum(loss_map)),
                               float(composed(tile)), rtol=1e-5)
    g_ref = jax.grad(composed)(tile)
    np.testing.assert_allclose(np.asarray(grad[:, :C, :]), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(grad[:, C:, :]), 0.0, atol=1e-30)


def test_ukd_terms_match_autodiff(rng):
    """The hand-derived per-pixel T/grad of the UKD kernel
    (ops/upsample_ce._ukd_terms) vs autodiff through the golden formula;
    the teacher tile is NEG-padded to the student's channel count exactly
    as _prep_call_pair does."""
    from bacs_tpu.ops.losses import unbiased_knowledge_distillation
    from bacs_tpu.ops.upsample_ce import NEG, _ukd_terms

    R, C, W, OLD = 4, 7, 8, 5
    tile_n = jnp.asarray(rng.randn(R, C, W).astype(np.float32))
    tile_o = jnp.asarray(rng.randn(R, OLD, W).astype(np.float32))
    c_pad = 16
    tn_p = jnp.pad(tile_n, ((0, 0), (0, c_pad - C), (0, 0)),
                   constant_values=NEG)
    to_p = jnp.pad(tile_o, ((0, 0), (0, c_pad - OLD), (0, 0)),
                   constant_values=NEG)

    for alpha in (1.0, 0.7):
        def composed(tn, alpha=alpha):
            new = jnp.transpose(tn, (0, 2, 1))[None]
            old = jnp.transpose(tile_o, (0, 2, 1))[None]
            # T_sum = -loss · n_pixels
            return -unbiased_knowledge_distillation(
                new, old, alpha=alpha
            ) * (R * W)

        t_map, grad = _ukd_terms(tn_p, to_p, OLD, alpha)
        np.testing.assert_allclose(float(jnp.sum(t_map)),
                                   float(composed(tile_n)), rtol=1e-5)
        g_ref = jax.grad(composed)(tile_n)
        np.testing.assert_allclose(np.asarray(grad[:, :C, :]),
                                   np.asarray(g_ref), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(grad[:, C:, :]), 0.0,
                                   atol=1e-30)


def test_per_image_ce_sums_value_and_grad(rng):
    """PLOP's per-image separation: [N] sums match composed per-image CE,
    and a factor-weighted combination's gradient matches autodiff through
    the composed path (exercises the per-image cotangent bwd)."""
    from bacs_tpu.ops.losses import cross_entropy as ce_none
    from bacs_tpu.ops.upsample_ce import upsampled_ce_sums_per_image

    sem = jnp.asarray(rng.randn(3, 8, 8, 5).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 5, (3, 32, 32)).astype(np.int32))
    labels = labels.at[0, :4].set(255)
    factor = jnp.asarray(np.array([0.3, 1.0, 1.7], np.float32))
    n_tot = 3 * 32 * 32

    def composed(s):
        up = resize_bilinear(s.astype(jnp.float32), (32, 32),
                             align_corners=False)
        nll = ce_none(up, labels, 255, reduction="none")
        return jnp.mean(factor[:, None, None] * nll)

    def fused(s):
        ls, _ = upsampled_ce_sums_per_image(s, labels, (32, 32), 255, None)
        return jnp.sum(factor * ls) / n_tot

    np.testing.assert_allclose(float(fused(sem)), float(composed(sem)),
                               rtol=1e-5)
    g1 = jax.grad(fused)(sem)
    g2 = jax.grad(composed)(sem)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4,
                               atol=1e-6)


def test_plop_pseudo_labels_match_method_golden(rng):
    """The fused pseudo-label op vs the golden plop._pseudo_labels math on
    identically upsampled logits (exact: same path on CPU)."""
    from bacs_tpu.methods.plop import PlopMethod
    from bacs_tpu.ops.upsample_ce import upsampled_plop_pseudo_labels

    OLD, C = 4, 6
    sem_old = jnp.asarray(rng.randn(2, 8, 8, OLD).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, C, (2, 32, 32)).astype(np.int32))
    labels = labels.at[0, :4].set(255)
    thresholds = jnp.asarray(
        np.concatenate([rng.rand(OLD) * 0.5 + 0.2, np.zeros(C - OLD)]
                       ).astype(np.float32)
    )
    max_entropy = jnp.float32(np.log(C))

    new_labels, num, den = upsampled_plop_pseudo_labels(
        sem_old, labels, thresholds, (32, 32), max_entropy, 255
    )

    up = resize_bilinear(sem_old.astype(jnp.float32), (32, 32),
                         align_corners=False)
    method = PlopMethod()
    state = type("S", (), {"plop_thresholds": thresholds,
                           "plop_max_entropy": max_entropy})()
    ref_labels, ref_factor = method._pseudo_labels(state, labels, up)
    np.testing.assert_array_equal(np.asarray(new_labels),
                                  np.asarray(ref_labels))
    factor = jnp.clip(num / jnp.maximum(den, 1.0), 0.0, None)
    np.testing.assert_allclose(np.asarray(factor), np.asarray(ref_factor),
                               rtol=1e-6)


def test_upsampled_argmax_nearest_matches_composed(rng):
    """SDR's teacher-argmax downsample: sampling the interp rows equals
    full-res argmax + resize_nearest exactly (same contraction values)."""
    from bacs_tpu.ops.interpolate import resize_nearest
    from bacs_tpu.ops.upsample_ce import upsampled_argmax_nearest

    sem = jnp.asarray(rng.randn(2, 8, 8, 5).astype(np.float32))
    up = resize_bilinear(sem.astype(jnp.float32), (64, 64),
                         align_corners=False)
    ref = resize_nearest(jnp.argmax(up, axis=-1).astype(jnp.int32), (8, 8))
    got = upsampled_argmax_nearest(sem, (64, 64), (8, 8))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_bacs_weighted_terms_match_autodiff(rng):
    """The hand-derived per-pixel loss/grad in ops/upsample_ce._bacs_terms
    (the in-kernel math of upsampled_bacs_weighted_ce) must match autodiff
    through ops/losses.weighted_cross_entropy's formula."""
    from bacs_tpu.ops.losses import weighted_cross_entropy
    from bacs_tpu.ops.upsample_ce import NEG, _bacs_terms

    R, C, W, OLD = 4, 7, 8, 5
    tile = jnp.asarray(rng.randn(R, C, W).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, C, (R, W)).astype(np.int32))
    labels = labels.at[0, :2].set(255)
    labels = labels.at[1, :4].set(0)  # exercise the focal-bg branch
    ms = jnp.asarray(rng.rand(R, W).astype(np.float32))

    # pad channels like the kernel's NEG-padded z
    c_pad = 8
    tile_p = jnp.pad(tile, ((0, 0), (0, c_pad - C), (0, 0)),
                     constant_values=NEG)

    for ukd in (True, False):
        def composed_u(t, ukd=ukd):
            x = jnp.transpose(t, (0, 2, 1))[None]
            return weighted_cross_entropy(
                x, labels[None], ms[None, :, :, None], OLD, gamma=2.0,
                threshold=0.5, ukd=ukd,
            ) * (R * W)

        loss_map, grad = _bacs_terms(tile_p, labels, ms, OLD, 2.0, 0.5, ukd)
        np.testing.assert_allclose(
            float(jnp.sum(loss_map)), float(composed_u(tile)), rtol=1e-5
        )
        g_ref = jax.grad(composed_u)(tile)
        np.testing.assert_allclose(
            np.asarray(grad[:, :C, :]), np.asarray(g_ref), rtol=1e-4,
            atol=1e-6,
        )
        # pad channels must receive zero gradient
        np.testing.assert_allclose(np.asarray(grad[:, C:, :]), 0.0,
                                   atol=1e-30)
