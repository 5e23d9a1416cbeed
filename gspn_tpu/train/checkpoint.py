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

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()


def load_stage1_params(ckpt_dir, abstract_state, subtree: str | None = None):
    """Restore a stage-1 (GSPN) TrainState and return its params (optionally
    a named subtree) for initializing the frozen proposal net in stage 2."""
    mgr = CheckpointManager(ckpt_dir)
    state = mgr.restore(abstract_state)
    mgr.close()
    if state is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    params = state.params if hasattr(state, "params") else state["params"]
    if subtree:
        params = params[subtree]
    return params
