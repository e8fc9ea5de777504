"""Orbax checkpointing with REAL resume.

The reference saves {global_step, epoch, model_state_dict, optimizer_state_dict}
(reference train.py:233-242) but has no resume path — checkpoints are
load-for-eval only (evaluate.py:66-67). Here both directions work: save the
full TrainState (step, params, opt_state, rng) and restore it to continue
training bit-exact.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, metrics: Optional[dict] = None,
             wait: bool = False) -> None:
        self._mgr.save(
            step, args=ocp.args.StandardSave(state), metrics=metrics or {}
        )
        if wait:
            self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return self._mgr.all_steps()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def save_params(path: str, params: Any) -> None:
    """One-shot param save (best_model.pt equivalent, train.py:419-428)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, template: Any = None) -> Any:
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), template)
    return ckptr.restore(os.path.abspath(path))
