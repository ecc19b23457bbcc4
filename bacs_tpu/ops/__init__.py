"""Pure-functional JAX ops: losses, metrics primitives, resizing.

These replace the reference's torch loss/metric utilities
(reference: training/loss_utils.py, training/metrics.py) with jit-friendly
NHWC implementations.
"""

from bacs_tpu.ops.losses import (  # noqa: F401
    cross_entropy,
    binary_focal_loss,
    unbiased_cross_entropy,
    unbiased_knowledge_distillation,
    weighted_cross_entropy,
    icarl_criterion,
    pixel_entropy,
    local_pod,
    features_distillation,
)
from bacs_tpu.ops.confusion import confusion_matrix, iou_from_confusion  # noqa: F401
from bacs_tpu.ops.interpolate import (  # noqa: F401
    resize_bilinear,
    resize_nearest,
)
