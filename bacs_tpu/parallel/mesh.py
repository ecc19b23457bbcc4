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


def replicate_to_global(tree, mesh: Mesh):
    """Host-local pytree → fully-replicated global jax.Arrays on `mesh`.

    Multihost jit rejects host-committed single-device inputs; every process
    holds an identical copy of the train state (same seeds, same restores),
    so the local value IS the global value.  No-op-cheap on single host too,
    but only needed — and only called — when `jax.process_count() > 1`.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        tree,
    )


def localize_to_host(tree):
    """Global fully-replicated pytree → process-local device arrays.

    The inverse of `replicate_to_global`, used around task-BOUNDARY passes
    (begin_task / end_task / head surgery): those run per-process plain jits
    and jnp ops over the full canonical stream, which must not receive
    global arrays.  Reading a fully-replicated global array is legal on
    every process; re-wrapping as jnp keeps `.at[]`-style surgery working.
    """
    import jax.numpy as jnp

    return jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), tree)


def make_data_mesh(n_devices: Optional[int] = None) -> Optional[Mesh]:
    """1-D data-parallel mesh over up to `n_devices` (None/1 → no mesh)."""
    devices = jax.devices()
    n = len(devices) if n_devices is None else min(n_devices, len(devices))
    if n <= 1:
        return None
    return Mesh(np.array(devices[:n]), ("data",))


def make_spatial_mesh(
    n_space: int, n_devices: Optional[int] = None
) -> Optional[Mesh]:
    """2-D (data, space) mesh: batch sharded over `data`, image HEIGHT over
    `space`.

    Spatial partitioning is pure GSPMD — the step is a plain jit with
    `P('data', 'space')` batch shardings and XLA inserts the convolution
    halo exchanges and cross-chip BN/grad reductions itself.  It scales a
    fixed global batch past the data-parallel limit (e.g. batch 16 on 32
    chips as 8 dp x 4 sp), something the reference's DDP cannot express.
    """
    devices = jax.devices()
    n = len(devices) if n_devices is None else min(n_devices, len(devices))
    if n <= 1 or n_space <= 1:
        return None
    if n % n_space:
        raise ValueError(f"{n} devices not divisible by n_space={n_space}")
    arr = np.array(devices[:n]).reshape(n // n_space, n_space)
    return Mesh(arr, ("data", "space"))
