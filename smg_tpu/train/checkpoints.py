"""Checkpoint / resume via Orbax.

The reference checkpoints only the model state_dict (every 50 iterations +
a rolling backup, reference logger.py:121-125, main.py:347-362) and
re-hydrates experiment counters by re-parsing the transitions logs
(trainer.preload, trainer.py:118-158); the optimizer state is lost across
restarts. Here a checkpoint carries the full *trainer* state — params, target
params, optimizer state, BN statistics and the iteration counter — so a
resumed run continues learning exactly where it stopped (the reference
lost optimizer state across restarts). Scenes, episode counters and the
loop RNG are re-initialized on resume: episodes are i.i.d. draws, so this
changes nothing statistically, but resume is not bit-identical replay.
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp

BACKUP_NAME = "backup"  # rolling snapshot (logger.save_backup_model parity)


class CheckpointManager:
    """Thin orbax wrapper with the reference's cadence knobs."""

    def __init__(self, directory: str, save_every: int = 50,
                 max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_every = save_every
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def maybe_save(self, step: int, state: Any) -> bool:
        """Save every `save_every` steps (main.py:354-360 cadence)."""
        if step % self.save_every != 0:
            return False
        self.save(step, state)
        return True

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: int | None = None) -> Any:
        """Restore into the structure of `state_template`."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(
                f"no checkpoint found under {self.directory}"
            )
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )


def save_params(path: str, params: Any) -> None:
    """One-off params snapshot (the --snapshot_file load path parity,
    trainer.py:63-65)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params)
    ckptr.wait_until_finished()


def load_params(path: str, template: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
