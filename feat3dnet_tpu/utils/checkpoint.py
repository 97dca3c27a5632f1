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

        # Optimizer slots (Adam moments) that live under an excluded scope
        # must ALSO come from init — the reference's Saver var_list excludes
        # 'detection/.../Adam' along with the weights (train.py:210-214);
        # keeping stale moments for fresh-init params would mis-scale their
        # first updates. Optimizer states mirror the param-tree structure,
        # so walk both trees by path and take init leaves whose path passes
        # through an excluded scope key.
        import jax.tree_util as jtu

        init_leaves, treedef = jtu.tree_flatten_with_path(init_state.opt_state)
        rest_leaves, _ = jtu.tree_flatten_with_path(restored.opt_state)
        excluded = set(restore_exclude)

        def pick(path_and_init, path_and_rest):
            path, init_leaf = path_and_init
            _, rest_leaf = path_and_rest
            for key in path:
                name = getattr(key, "key", None)
                if name in excluded:
                    return init_leaf
            return rest_leaf

        merged_opt = jtu.tree_unflatten(
            treedef, [pick(a, b) for a, b in zip(init_leaves, rest_leaves)])

        return TrainState(
            step=restored.step,
            params=merge(init_state.params, restored.params),
            batch_stats=merge(init_state.batch_stats, restored.batch_stats),
            opt_state=merged_opt,
        )
