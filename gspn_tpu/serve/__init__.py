"""Serving/deployment layer: AOT-exported inference artifacts.

The reference has no serving story at all — its eval scripts rebuild the
TF1 graph from Python source every run (SURVEY.md §1/§3.3). Here
deployment is a first-class TPU capability: the entire fused pipeline
(models/pipeline.py::make_inference_fn — seeds, GSPN decode, NMS,
RoIAlign, heads, mask projection in ONE XLA program) exports to a
versioned StableHLO artifact via ``jax.export``. Serving a model then
needs only the artifact file and jax — no gspn_tpu model code, no
Python config reconstruction, no retrace.
"""

from gspn_tpu.serve.export import (  # noqa: F401
    export_inference,
    load_artifact,
    save_artifact,
)
from gspn_tpu.serve.runtime import (  # noqa: F401
    Client,
    InferenceSession,
    Server,
    pipeline_config_from_manifest,
    session_from_checkpoints,
)
