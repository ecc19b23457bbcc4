"""Per-task prototype tracking method (reference: loss/prototypes.py).

The prototype math itself lives in methods/base.py
(`update_task_prototypes`); this class just switches tracking on and keeps
the CE objective.
"""

from __future__ import annotations

from bacs_tpu.methods.base import Method


class PrototypesMethod(Method):
    def __init__(self, name: str = "Prototypes", **kwargs):
        kwargs["track_prototypes"] = True
        super().__init__(name=name, **kwargs)
