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


def shard_batch(mesh: Mesh, batch: dict, axis: str = "data") -> dict:
    """Place a host batch with the leading dim sharded across the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params/state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
