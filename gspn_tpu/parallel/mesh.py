"""Device-mesh helpers.

The reference is single-process single-GPU (SURVEY.md §2.3 — no NCCL, no
Horovod); parallelism here is first-class instead: a 1-D ``data`` mesh over
all local devices (v5e-8 on a pod slice, virtual CPU devices in tests),
with XLA collectives over ICI emitted by ``shard_map``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devs)} "
                f"(set XLA_FLAGS=--xla_force_host_platform_device_count=N "
                f"with JAX_PLATFORMS=cpu for virtual meshes)"
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_mesh_2d(
    n_data: int,
    n_space: int | None = None,
    data_axis: str = "data",
    space_axis: str = "space",
) -> Mesh:
    """2-D hybrid mesh: scenes shard over ``data_axis`` (outer — on real
    pods the slower hops), each scene's intra-scene work over
    ``space_axis`` (inner — consecutive devices, the fastest ICI links,
    carrying the per-scene all_gathers). ``n_space`` defaults to all
    remaining local devices."""
    devs = jax.devices()
    if n_space is None:
        if len(devs) % n_data:
            raise ValueError(
                f"{len(devs)} devices not divisible into {n_data} data rows"
            )
        n_space = len(devs) // n_data
    need = n_data * n_space
    if len(devs) < need:
        raise ValueError(
            f"need {need} devices ({n_data}x{n_space}), have {len(devs)}"
        )
    grid = np.asarray(devs[:need]).reshape(n_data, n_space)
    return Mesh(grid, (data_axis, space_axis))


def shard_batch(mesh: Mesh, batch: dict, axis: str = "data") -> dict:
    """Place a host batch with the leading dim sharded across the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params/state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
