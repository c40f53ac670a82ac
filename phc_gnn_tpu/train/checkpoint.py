"""Checkpoint / resume via orbax: params + opt state + BN stats + step.

The reference pickles the whole torch module as model.pt / model_last.pt with no
mid-run resume (train_hiv.py:340-344,360; SURVEY.md section 5.4); here the full
train state checkpoints atomically and training resumes exactly, plus a
best-validation export.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    """Thin orbax wrapper: save(step, state), restore latest, export best."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True))

    def save(self, step: int, state: Any, metrics: Optional[dict] = None):
        """Async save; completion is awaited before restore/close so the epoch
        loop never blocks on serialization."""
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics or {})

    def latest_step(self) -> Optional[int]:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def restore(self, abstract_state: Any, step: Optional[int] = None) -> Any:
        self._mgr.wait_until_finished()
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self._dir}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))

    def export_best(self, state: Any, name: str = "best"):
        """Stand-alone export of the best-validation state (reference's
        model.pt analogue)."""
        path = os.path.join(self._dir, name)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()

    def restore_best(self, abstract_state: Any, name: str = "best") -> Any:
        path = os.path.join(self._dir, name)
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, abstract_state)

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()
