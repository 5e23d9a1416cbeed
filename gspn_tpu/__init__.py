"""gspn_tpu — TPU-native rebuild of GSPN (Generative Shape Proposal Network).

A from-scratch JAX/XLA/Pallas framework providing the full capability
surface of the reference `ericyi/GSPN` (CVPR'19, arXiv:1812.03320):

- ``gspn_tpu.ops``     — point-cloud op library (FPS, ball query, grouping,
  three-NN interpolation, chamfer/nn_distance, prob sampling, 3D NMS).
  Hot ops have Pallas TPU kernels; gather-style ops lower to native XLA.
  Replaces the reference's ``tf_ops/{sampling,grouping,3d_interpolation,
  nn_distance}`` CUDA/C++ custom TF ops.
- ``gspn_tpu.nn``      — PointNet++ building blocks (set abstraction,
  feature propagation, shared MLPs as fused matmuls). Replaces
  ``utils/pointnet_util.py`` + ``utils/tf_util.py``.
- ``gspn_tpu.models``  — GSPN CVAE proposal network and R-PointNet
  (backbone + Point RoIAlign + heads). Replaces ``models/``.
- ``gspn_tpu.data``    — fixed-shape, mask-padded data pipeline
  (ScanNet / ShapeNet / PartNet formats + synthetic generators).
- ``gspn_tpu.train``   — jitted train steps, Orbax checkpointing,
  config dataclasses, JSONL metrics.
- ``gspn_tpu.parallel``— SPMD data parallelism over a ``jax.sharding.Mesh``
  (psum over ICI), absent from the single-GPU reference but first-class here.
- ``gspn_tpu.eval``    — ScanNet-protocol instance-segmentation AP.

All shapes are static; variable-size structure (points per scene, points
per ball, proposals after NMS) is expressed as fixed sizes + masks so the
whole pipeline stays inside one XLA program.
"""

__version__ = "0.1.0"


def _honor_jax_platforms_env():
    """Restore standard JAX behavior on images whose TPU plugin
    force-selects itself at config level, clobbering an explicit
    ``JAX_PLATFORMS`` request (this breaks CPU-mesh runs of the CLIs:
    a "cpu" run silently lands on the tunneled chip). A no-op when the
    env var is unset or the backend is already initialized."""
    import os

    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    try:
        import jax

        if jax.config.jax_platforms != want:
            jax.config.update("jax_platforms", want)
    except Exception:
        pass


_honor_jax_platforms_env()

from gspn_tpu import ops  # noqa: F401,E402
