"""Checkpoint save / auto-resume via orbax.

Mirrors the reference's robustness semantics (ref: run_nerf.py:276-297,
617-638): periodic saves keyed by step, never overwriting, newest-step
auto-resume restoring params + optimizer state + step (+ the event
dataset's annealing counter, handled by the caller). ``ft_path`` fine-tune
loads are supported by pointing ``directory`` at another run.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True))

    def save(self, step: int, state: Any, force: bool = False):
        self._mngr.save(int(step), args=ocp.args.StandardSave(state),
                        force=force)

    def wait(self):
        self._mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore_latest(self, template: Any) -> Optional[tuple]:
        """Restore the newest checkpoint into ``template``'s structure.

        Returns (step, state) or None when no checkpoint exists."""
        step = self._mngr.latest_step()
        if step is None:
            return None
        state = self._mngr.restore(step,
                                   args=ocp.args.StandardRestore(template))
        return step, state

    def close(self):
        self._mngr.wait_until_finished()
        self._mngr.close()
