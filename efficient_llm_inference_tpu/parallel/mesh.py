"""Device-mesh construction and sharding helpers.

The distribution layer is entirely new relative to the reference (strictly
single-device, SURVEY.md §2.3). Design follows the scaling-book recipe: pick
a mesh with named axes ("data", "model"), annotate shardings with
NamedSharding/PartitionSpec, let XLA's SPMD partitioner insert the
collectives (all-gather / reduce-scatter / psum) over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Tuple[int, int] = (1, 1),
    axis_names: Sequence[str] = ("data", "model"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh over (data, model) axes. Even 1-chip runs go through a Mesh(1,1)
    so sharding is never retrofitted (SURVEY.md §7 build order)."""
    devices = list(devices if devices is not None else jax.devices())
    n = int(np.prod(shape))
    if len(devices) < n:
        raise ValueError(f"need {n} devices for mesh {shape}, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def auto_mesh_shape(n_devices: int, prefer_model: int = 0) -> Tuple[int, int]:
    """Factor n into (data, model). With prefer_model>0, use that TP degree."""
    if prefer_model and n_devices % prefer_model == 0:
        return (n_devices // prefer_model, prefer_model)
    # default: as much tensor parallelism as divides cleanly, capped at 8
    for tp in (8, 4, 2, 1):
        if n_devices % tp == 0:
            return (n_devices // tp, tp)
    return (n_devices, 1)


def named(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def shard_params(params, rules, mesh: Mesh):
    """device_put a param pytree according to a spec pytree (same structure)."""
    return jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, rules
    )
