"""Orbax checkpointing: save/resume of train state + frozen tokenizer refs.

Replaces the reference's torch .pth dicts {model, optimizer, epoch, step}
(reference: train_control_var_hpu.py:420-447) with async-capable Orbax
checkpoints; `latest_step`/`restore` give the resume path including the
reference's epoch-bump heuristic handled by the caller via metadata.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointIO:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, metadata: Optional[Dict] = None) -> None:
        args = ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            **(
                {"metadata": ocp.args.JsonSave(metadata)}
                if metadata is not None
                else {}
            ),
        )
        self.manager.save(step, args=args)

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state_like: Any, step: Optional[int] = None):
        """Restore into the structure of `state_like` (shapes/dtypes/shardings)."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None, None
        target = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, state_like)
        restored = self.manager.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(target),
                metadata=ocp.args.JsonRestore(),
            ),
        )
        meta = restored.get("metadata") if hasattr(restored, "get") else restored["metadata"]
        return restored["state"], meta

    def restore_raw(self, step: Optional[int] = None):
        """Template-free restore: returns the saved state pytree as host
        numpy arrays (for export/inspection tools that don't want to build
        a full TrainState template)."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None, None
        restored = self.manager.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(),
                metadata=ocp.args.JsonRestore(),
            ),
        )
        state = jax.tree_util.tree_map(np.asarray, restored["state"])
        return state, restored["metadata"]

    def wait(self):
        self.manager.wait_until_finished()
