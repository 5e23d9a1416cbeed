"""AOT export of the fused inference pipeline to a serving artifact.

``export_inference`` lowers ``make_inference_fn(cfg)`` once, for an
explicit (batch, n_points, feature_dim) serving shape, into a
``jax.export.Exported`` — StableHLO plus the calling convention — and
``save_artifact``/``load_artifact`` wrap it in a single-file zip with a
JSON manifest (format version, shapes, platforms, the full pipeline
config via train/config_io) so an artifact is self-describing.

Serving host then does::

    exported, meta = load_artifact("model.gspnx")
    preds = exported.call(variables, xyz, valid, rng_key)

``Exported.call`` stages the deserialized StableHLO straight into the
caller's jit — platform-checked (an artifact exported for "tpu" refuses
to run on cpu and vice versa), no Python model code required.

Replaces: nothing in the reference — it rebuilds the TF1 graph from
source at every eval run (SURVEY.md §3.3); this is the rebuild's
deployment story (brief: "intended for large-scale production
deployment and serving").

Design notes:
- The variables pytree is part of the exported calling convention
  (``Exported.in_tree``); ``load_artifact`` needs no model class to
  reconstruct it — the caller passes the same tree shape the exporter
  saw (e.g. restored from an Orbax checkpoint).
- Pallas kernels export as Mosaic custom calls only when lowering FOR
  tpu; exporting for "cpu" (tests, CPU serving) must use the XLA op
  paths — ``export_inference`` rewrites ``ops_impl="xla"`` into the
  config when the target platforms are CPU-only, and refuses
  "pallas" explicitly (interpret-mode Pallas is a host-callback
  construct and cannot serialize).
"""

from __future__ import annotations

import dataclasses
import io
import json
import pathlib
import zipfile
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export

from gspn_tpu.models.pipeline import (
    InstancePredictions,
    PipelineConfig,
    make_inference_fn,
)
from gspn_tpu.train.config_io import _to_jsonable

FORMAT = "gspn_tpu.serving"
FORMAT_VERSION = 1

# The output pytree (a flax.struct dataclass) rides inside the serialized
# calling convention; registration is process-global and must happen
# before the first serialize/deserialize. Serialized name is stable —
# part of the artifact format, do not rename.
try:
    jax_export.register_pytree_node_serialization(
        InstancePredictions,
        serialized_name="gspn_tpu.InstancePredictions",
        serialize_auxdata=lambda aux: b"",
        deserialize_auxdata=lambda b: None,
        from_children=lambda aux, children: InstancePredictions(*children),
    )
except ValueError as e:
    # tolerate ONLY double-registration (importlib.reload in tests);
    # any other registration failure must surface here, not later
    # inside serialize()/deserialize()
    if "multiple serializations" not in str(e) and "already" not in str(e):
        raise


def _cpu_only(platforms: Sequence[str]) -> bool:
    return all(p.lower() == "cpu" for p in platforms)


def export_inference(
    cfg: PipelineConfig,
    variables: Any,
    n_points: int,
    *,
    batch_size: int = 1,
    feature_dim: int = 0,
    platforms: Sequence[str] | None = None,
) -> jax_export.Exported:
    """Export ``infer(variables, xyz, features?, valid, rng)`` at a fixed
    serving shape. ``variables`` supplies the pytree STRUCTURE and dtypes
    (values are not baked in — they stay a runtime input, so one artifact
    serves any checkpoint with the same architecture).

    ``platforms`` defaults to the current default export platform (the
    chip when run there). Cross-platform export — e.g. building a "tpu"
    artifact from a CPU host — is supported by jax.export and works here
    as long as the config's op impls legalize for the target.
    """
    if platforms is None:
        platforms = (jax_export.default_export_platform(),)
    platforms = tuple(platforms)
    for sub in (cfg.gspn, cfg.rpointnet):
        if sub.ops_impl == "pallas" and _cpu_only(platforms):
            raise ValueError(
                "ops_impl='pallas' cannot export for cpu-only platforms "
                "(interpret-mode Pallas is a host construct); use "
                "ops_impl='xla' or export for tpu"
            )
    if _cpu_only(platforms):
        # "auto" resolves at trace time by backend sniffing; pin the
        # serializable path explicitly for a cpu artifact.
        cfg = dataclasses.replace(
            cfg,
            gspn=dataclasses.replace(cfg.gspn, ops_impl="xla"),
            rpointnet=dataclasses.replace(cfg.rpointnet, ops_impl="xla"),
        )

    infer = make_inference_fn(cfg)
    b, n, f = batch_size, n_points, feature_dim

    # shape/dtype only — no device transfer of the checkpoint
    var_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        variables,
    )
    xyz_spec = jax.ShapeDtypeStruct((b, n, 3), jnp.float32)
    valid_spec = jax.ShapeDtypeStruct((b, n), jnp.bool_)
    rng_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)

    if f:
        feat_spec = jax.ShapeDtypeStruct((b, n, f), jnp.float32)

        def fn(variables, xyz, features, valid, rng):
            return infer(variables, xyz, features, valid, rng)

        args = (var_spec, xyz_spec, feat_spec, valid_spec, rng_spec)
    else:

        def fn(variables, xyz, valid, rng):
            return infer(variables, xyz, None, valid, rng)

        args = (var_spec, xyz_spec, valid_spec, rng_spec)

    return jax_export.export(jax.jit(fn), platforms=list(platforms))(*args)


def save_artifact(
    path: str | pathlib.Path,
    exported: jax_export.Exported,
    cfg: PipelineConfig,
    *,
    extra_meta: dict | None = None,
) -> pathlib.Path:
    """Write a single-file artifact: zip(manifest.json, module.bin)."""
    p = pathlib.Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    manifest = {
        "format": FORMAT,
        "format_version": FORMAT_VERSION,
        "platforms": list(exported.platforms),
        "fun_name": exported.fun_name,
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "pipeline_config": _to_jsonable(cfg),
        **(extra_meta or {}),
    }
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("manifest.json", json.dumps(manifest, indent=2))
        z.writestr("module.bin", exported.serialize())
    p.write_bytes(buf.getvalue())
    return p


def load_artifact(
    path: str | pathlib.Path,
) -> tuple[jax_export.Exported, dict]:
    """Read an artifact back: (Exported ready to ``.call``, manifest)."""
    data = pathlib.Path(path).read_bytes()
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        manifest = json.loads(z.read("manifest.json"))
        if manifest.get("format") != FORMAT:
            raise ValueError(
                f"{path} is not a {FORMAT} artifact "
                f"(format={manifest.get('format')!r})"
            )
        if manifest.get("format_version", 0) > FORMAT_VERSION:
            raise ValueError(
                f"artifact format_version {manifest['format_version']} is "
                f"newer than supported {FORMAT_VERSION}"
            )
        exported = jax_export.deserialize(z.read("module.bin"))
    return exported, manifest
