"""Checkpoint save/load (orbax) for inference param bundles and training state.

Replaces the reference's torch.save/.pth + latest.ckpt pointer scheme
(core/trainer.py:274-319) with orbax checkpointing; the converter
(convert/torch_to_jax.py) bridges the released .pth files one time.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_params_bundle(path: str, params: dict):
    """Save a dict of param trees (e.g. {'raft': ..., 'flowcomp': ...,
    'inpaint': ...}) to an orbax checkpoint directory."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_params_bundle(path: str) -> dict:
    """Load a param-tree bundle saved by save_params_bundle."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path)


class TrainCheckpointManager:
    """Iteration-stamped training checkpoints with a 'latest' pointer,
    mirroring the reference's gen_%06d/dis_%06d/opt_%06d + latest.ckpt
    semantics (core/trainer.py:274-319) on top of orbax."""

    def __init__(self, directory: str, max_to_keep: int | None = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True)
        self.manager = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state):
        self.manager.save(step, args=ocp.args.StandardSave(state))
        self.manager.wait_until_finished()

    def latest_step(self) -> int | None:
        return self.manager.latest_step()

    def restore(self, state_like, step: int | None = None):
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return self.manager.restore(
            step, args=ocp.args.StandardRestore(state_like))
