"""Device-mesh helpers: the entire distributed "backend".

Replaces the reference's three communication mechanisms — CustomDDP/NCCL
process groups, inplace_abn's internal sync, and the thread-queue SyncBN
(reference: training/trainer.py:24-54, networks/utils.py:116-592) — with a
mesh definition; XLA emits the collectives (SURVEY §2.9, §5).

Multi-host (DCN) support rides `jax.distributed.initialize` + the same mesh
over the global device list.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def multihost_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host runtime (no-op on single host).

    On a real TPU pod slice, the TPU environment variables are auto-detected
    and `jax.distributed.initialize()` needs no arguments.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_data_mesh(n_devices: Optional[int] = None) -> Optional[Mesh]:
    """1-D data-parallel mesh over up to `n_devices` (None/1 → no mesh)."""
    devices = jax.devices()
    n = len(devices) if n_devices is None else min(n_devices, len(devices))
    if n <= 1:
        return None
    return Mesh(np.array(devices[:n]), ("data",))
