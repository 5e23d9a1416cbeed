"""Checkpoint / resume via Orbax — replaces the reference's
``tf.train.Saver`` periodic ``.ckpt`` flow (SURVEY.md §5), with explicit
param-tree namespacing so stage-2 can restore stage-1 CVAE params by
subtree (the reference restores by TF variable scope name).
"""

from __future__ import annotations

import pathlib
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper: save/restore TrainState pytrees + metadata."""

    def __init__(self, directory: str | pathlib.Path, max_to_keep: int = 3):
        self._dir = pathlib.Path(directory).absolute()
        self._dir.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )
        self._mgr.wait_until_finished()
        return saved

    def restore(self, abstract_state: Any, step: int | None = None):
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract_state)
        )

    def restore_params(self, abstract_variables: Any, step: int | None = None):
        """Restore only the variable collections of a saved TrainState
        (e.g. ``{"params": ..., "batch_stats": ...}`` of ShapeDtypeStructs),
        skipping ``opt_state``/``step``. Unlike :meth:`restore`, this does
        not require knowing which optimizer/lr-schedule the saving trainer
        used — their ``opt_state`` pytrees differ (constant-lr adam vs
        schedule-wrapped adam), which is exactly what frozen-stage restore
        and eval must be agnostic to."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return self._mgr.restore(
            step,
            args=ocp.args.PyTreeRestore(
                item=abstract_variables, partial_restore=True
            ),
        )

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()


def restore_variable_collections(ckpt_dir, variables):
    """Restore ``{"params", "batch_stats"}`` shaped like ``variables``
    from the latest checkpoint under ``ckpt_dir`` (optimizer-agnostic
    params-only partial restore). Shared by eval, the demo, and stage-2
    frozen-GSPN loading."""
    import jax

    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        },
    )
    mgr = CheckpointManager(ckpt_dir)
    restored = mgr.restore_params(abstract)
    mgr.close()
    if restored is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    return {
        "params": restored["params"],
        "batch_stats": restored["batch_stats"],
    }


def load_stage1_params(ckpt_dir, abstract_state, subtree: str | None = None):
    """Restore a stage-1 (GSPN) checkpoint's params (optionally a named
    subtree) for initializing the frozen proposal net in stage 2.

    ``abstract_state`` may be a full abstract TrainState or just a dict
    with a ``params`` entry — only the params collection is read, so the
    optimizer the stage-1 trainer used is irrelevant."""
    ap = (
        abstract_state.params
        if hasattr(abstract_state, "params")
        else abstract_state["params"]
    )
    mgr = CheckpointManager(ckpt_dir)
    restored = mgr.restore_params({"params": ap})
    mgr.close()
    if restored is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    params = restored["params"]
    if subtree:
        params = params[subtree]
    return params
