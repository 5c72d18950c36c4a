"""Checkpoint save/restore via orbax (params + both optimizer states + step).

Replaces the reference's mmengine CheckpointHook plumbing (interval/max_keep
per config, `--resume auto` in train.py:36-43, :109-115) with orbax's
CheckpointManager. The reference's stale-checkpoint backup dance
(train_kitti_3class_adversarial.py:116-170) is unnecessary here — the state
schema is explicit and versioned by orbax.
"""
from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from .loop import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 10, save_interval_epochs: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=False
            ),
        )
        self.save_interval_epochs = save_interval_epochs

    def save(self, epoch: int, state: TrainState) -> None:
        self._mgr.save(epoch, args=ocp.args.StandardSave(state._asdict()))
        self._mgr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: TrainState, epoch: Optional[int] = None) -> TrainState:
        """Restore into the shape/dtype structure of `state_template`."""
        step = epoch if epoch is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self.directory}")
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template._asdict())
        )
        return TrainState(**restored)

    def maybe_save(self, epoch: int, state: TrainState) -> bool:
        if (epoch + 1) % self.save_interval_epochs == 0:
            self.save(epoch, state)
            return True
        return False
