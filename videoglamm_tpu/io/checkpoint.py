"""Orbax checkpointing.

Replaces the reference's three checkpoint formats (SURVEY §5.4: DeepSpeed
engine checkpoints + `latest` marker files, HF save_pretrained exports, and
composed pretrained loads with PEFT merges —
/root/reference/VideoGLaMM/utils/trainer.py:269-276,
train_ds_with_videogptplus.py:146-210,319-343) with ONE Orbax tree:

  <dir>/<step>/state    — TrainState (params + opt_state + step)
  <dir>/<step>/metadata — config + trainable mask

Sharded arrays restore onto their meshes natively (Orbax handles GSPMD
layouts); resume = `latest_step` + `restore`.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any, metadata: Optional[dict] = None,
             wait: bool = True):
        args = {"state": ocp.args.StandardSave(state)}
        if metadata is not None:
            args["metadata"] = ocp.args.JsonSave(metadata)
        self._mngr.save(step, args=ocp.args.Composite(**args))
        if wait:
            self._mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure/shardings of `state_like` (an abstract
        or concrete TrainState pytree)."""
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        restored = self._mngr.restore(
            step, args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_like)))
        return restored["state"]

    def restore_metadata(self, step: Optional[int] = None) -> dict:
        step = self.latest_step() if step is None else step
        restored = self._mngr.restore(
            step, args=ocp.args.Composite(metadata=ocp.args.JsonRestore()))
        return restored["metadata"]

    def close(self):
        self._mngr.close()


def save_params(directory: str, params: Any):
    """One-shot param-tree export (inference checkpoints)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(directory), params, force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def load_params(directory: str, params_like: Optional[Any] = None) -> Any:
    ckptr = ocp.StandardCheckpointer()
    out = ckptr.restore(os.path.abspath(directory), params_like)
    ckptr.close()
    return out
