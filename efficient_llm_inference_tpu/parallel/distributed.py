"""Multi-host initialization over DCN.

The reference has no distributed backend at all (SURVEY.md §2.3). On TPU
pods, JAX's runtime handles DCN coordination: every host calls
`jax.distributed.initialize`, then `jax.devices()` spans the whole slice and
the same Mesh/NamedSharding code used on one host scales out — collectives
ride ICI within a host slice and DCN across hosts, inserted by XLA from the
sharding annotations (no NCCL/MPI analog to manage).

This environment exposes a single chip, so multi-host paths are validated
via the virtual-device mesh tests (tests/test_sharding.py) and the driver's
dryrun; on a real pod slice the only extra step is calling
`init_distributed()` before building the mesh.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize multi-host JAX (no-op on a single process).

    With no arguments, relies on TPU pod auto-detection (the runtime infers
    coordinator/process ids from the pod metadata); explicit arguments
    support manual bring-up (e.g. GCE VMs over DCN).

    Returns a summary dict: process_index, process_count, device counts.
    """
    explicit = coordinator_address is not None
    already = jax.process_count() > 1
    if not already and (explicit or os.environ.get("JAX_COORDINATOR_ADDRESS")):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def global_mesh(data: int = -1, model: int = 1):
    """Build a (data, model) mesh over ALL processes' devices.

    data=-1 means "everything not used by model parallelism". Model-parallel
    groups are laid out within a host first so TP collectives ride ICI, not
    DCN (scaling-book layout rule).
    """
    from .mesh import make_mesh

    n = jax.device_count()
    if data == -1:
        assert n % model == 0, (n, model)
        data = n // model
    return make_mesh((data, model), devices=jax.devices())
