"""Data layer: datasets, continual scenarios, on-device augmentation pipeline.

Replaces the reference's torchvision/continuum/Lightning stack
(reference: dataloaders/, dataset/) with host-side decode + a single jitted
device transform (crop/flip/normalize/label-remap fused — SURVEY.md §7.2).
"""

from bacs_tpu.data.continual import ContinualScenario  # noqa: F401
from bacs_tpu.data.datamodule import DataModule, create_datamodule  # noqa: F401
