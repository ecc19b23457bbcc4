"""Fine-tuning cross-entropy baseline (reference: loss/cross_entropy.py)."""

from __future__ import annotations

from bacs_tpu.methods.base import Method


class CrossEntropyMethod(Method):
    """Plain CE through the shared base core — the fine-tuning baseline."""

    def __init__(self, name: str = "CrossEntropy", **kwargs):
        super().__init__(name=name, **kwargs)
