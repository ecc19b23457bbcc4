"""Metric logging: stdout always, wandb when available and configured.

The reference logs exclusively to Weights & Biases
(reference: training/trainer.py:225-236); this environment has no wandb, so
the logger degrades to structured stdout lines while keeping the same metric
namespace.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Any, Dict


class Logger:
    def __init__(self, config: Dict[str, Any] | None = None):
        self._t0 = time.time()
        self._wandb = None
        # multihost: only the coordinator prints/logs (the reference's
        # Lightning rank_zero gating)
        import jax

        self._primary = jax.process_index() == 0
        wcfg = (config or {}).get("wandb", {}) or {}
        if wcfg.get("enabled") and self._primary:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(
                    project=wcfg.get("project", "bacs-tpu"),
                    name=wcfg.get("name"),
                    config=config.to_dict() if hasattr(config, "to_dict") else config,
                )
            except Exception:
                self._wandb = None

    def info(self, msg: str):
        if not self._primary:
            return
        dt = time.time() - self._t0
        print(f"[{dt:8.1f}s] {msg}", flush=True)

    def log_metrics(self, metrics: Dict[str, float], step: int | None = None):
        if not self._primary:
            return
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        compact = {
            k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in metrics.items()
            if "/IoU-" not in k or "/IoU-Old" in k or "/IoU-New" in k
        }
        self.info(json.dumps(compact))
