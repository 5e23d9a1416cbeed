"""SPMD parallelism over jax.sharding meshes (DP grads psum over ICI)."""

from gspn_tpu.parallel.dp import make_dp_inference, make_dp_train_step
from gspn_tpu.parallel.mesh import make_mesh, replicate, shard_batch

__all__ = [
    "make_dp_inference",
    "make_dp_train_step",
    "make_mesh",
    "replicate",
    "shard_batch",
]
