"""Orbax checkpoint/resume (SURVEY.md §5 'checkpoint / resume').

The reference relied on tf.estimator's automatic checkpointing: re-running
with the same model_dir resumed from the latest checkpoint. Same contract
here, done with orbax: each checkpoint stores {train state, config json,
data-iterator state}, `restore_latest` resumes everything, and saves are
atomic (orbax writes to a tmp dir and renames). SIGTERM-safety comes from
the atomic rename: a killed save never corrupts the previous checkpoint.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp

from deepdenoiser_tpu.training.train import TrainState


class CheckpointManager:
    def __init__(self, directory: str | Path, keep: int = 3):
        self._dir = Path(directory).absolute()
        self._dir.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True, enable_async_checkpointing=True
            ),
        )

    @property
    def directory(self) -> Path:
        return self._dir

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def save(
        self,
        step: int,
        state: TrainState,
        extra: Optional[Dict[str, Any]] = None,
        force: bool = False,
    ) -> bool:
        """Async save; returns whether a save was started."""
        args = {"state": ocp.args.StandardSave(state)}
        if extra is not None:
            args["extra"] = ocp.args.JsonSave(extra)
        return self._mgr.save(step, args=ocp.args.Composite(**args), force=force)

    def restore_latest(
        self, template: TrainState
    ) -> Optional[Tuple[TrainState, Dict[str, Any]]]:
        """Restore the newest checkpoint into `template`'s structure, or None."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(state=ocp.args.StandardRestore(template)),
        )
        state = restored["state"]
        extra: Dict[str, Any] = {}
        extra_path = self._mgr.directory / str(step) / "extra"
        if extra_path.exists():
            extra = self._mgr.restore(
                step, args=ocp.args.Composite(extra=ocp.args.JsonRestore())
            )["extra"]
        return state, extra

    def wait(self) -> None:
        """Block until pending async saves land (call before exit)."""
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
