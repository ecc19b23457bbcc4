"""IoU metric and resize parity tests."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from bacs_tpu.ops.confusion import confusion_matrix, iou_from_confusion
from bacs_tpu.ops.interpolate import resize_bilinear, resize_nearest


def test_iou_reference_case():
    """The reference's only real unit test (training/metrics.py:159-183)."""
    label = np.zeros((1, 4, 4), np.int32)
    pred = np.zeros((1, 4, 4), np.int32)
    label[:, :3, :3] = 1
    pred[:, -3:, -3:] = 1
    cm = confusion_matrix(jnp.asarray(pred), jnp.asarray(label), 2)
    m = iou_from_confusion(cm)
    np.testing.assert_allclose(
        np.asarray(m.iou_per_class), [2.0 / 12, 4.0 / 14], rtol=1e-6
    )


def test_detailed_metrics_include_specificity():
    """Specificity = tn/(tn+fp) per class, mean-reduced like the others
    (reference: training/metrics.py:73-85)."""
    from bacs_tpu.train.metrics import detailed_iou_metrics

    label = np.array([[0, 0, 1, 1]], np.int32)
    pred = np.array([[0, 1, 1, 1]], np.int32)
    cm = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(label), 2))
    out = detailed_iou_metrics(cm, initial_classes=2, nb_current_classes=2)
    # class 0: tn=2 fp=0 → 1.0; class 1: tn=1 fp=1 → 0.5
    np.testing.assert_allclose(out["Specificity"], 0.75, rtol=1e-6)
    assert {"mIoU", "Accuracy", "Precision", "Recall"} <= set(out)


def test_confusion_ignores_255():
    label = np.array([[0, 1, 255, 1]], np.int32)
    pred = np.array([[0, 1, 1, 0]], np.int32)
    cm = np.asarray(confusion_matrix(jnp.asarray(pred), jnp.asarray(label), 2))
    assert cm.sum() == 3
    assert cm[1, 1] == 1 and cm[1, 0] == 1 and cm[0, 0] == 1


def test_resize_bilinear_matches_torch_align_false(rng):
    x = rng.randn(2, 7, 9, 3).astype(np.float32)
    ours = resize_bilinear(jnp.asarray(x), (14, 18), align_corners=False)
    ref = F.interpolate(
        torch.tensor(np.moveaxis(x, -1, 1)), size=(14, 18), mode="bilinear",
        align_corners=False,
    )
    np.testing.assert_allclose(
        np.asarray(ours), np.moveaxis(ref.numpy(), 1, -1), rtol=1e-4, atol=1e-5
    )


def test_resize_bilinear_matches_torch_align_true(rng):
    x = rng.randn(1, 4, 4, 2).astype(np.float32)
    ours = resize_bilinear(jnp.asarray(x), (8, 8), align_corners=True)
    ref = F.interpolate(
        torch.tensor(np.moveaxis(x, -1, 1)), size=(8, 8), mode="bilinear",
        align_corners=True,
    )
    np.testing.assert_allclose(
        np.asarray(ours), np.moveaxis(ref.numpy(), 1, -1), rtol=1e-4, atol=1e-5
    )


def test_resize_nearest_matches_torch(rng):
    lbl = rng.randint(0, 5, (2, 9, 9)).astype(np.float32)
    ours = resize_nearest(jnp.asarray(lbl).astype(jnp.int32), (4, 4))
    ref = F.interpolate(
        torch.tensor(lbl).unsqueeze(1).double(), size=(4, 4), mode="nearest"
    ).long()[:, 0]
    np.testing.assert_array_equal(np.asarray(ours), ref.numpy())
