"""Visualization / observability callbacks (reference: visualization/)."""

from bacs_tpu.viz.media import MediaLogger, voc_colormap  # noqa: F401
from bacs_tpu.viz.drift import DriftProbe  # noqa: F401
from bacs_tpu.viz.prototypes_viz import PrototypeLogger  # noqa: F401
