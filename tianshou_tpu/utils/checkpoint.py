"""Checkpoint/resume via orbax: params, optimizer state, buffer, counters.

Counterpart of the reference's three persistence mechanisms (SURVEY.md §5):
trainer ``save_checkpoint_fn`` hooks (``trainer/base.py:340-345``), buffer
HDF5, and high-level ``PolicyPersistence`` — unified here as one orbax
checkpoint of the full training pytree (TrainState + ReplayBufferState +
integer counters), exactly the ingredients needed to resume a run
bit-for-bit on any mesh.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_checkpoint_step"]


def save_checkpoint(
    path: str,
    state: Any,
    step: int | None = None,
    overwrite: bool = True,
) -> str:
    """Save a pytree checkpoint to ``path`` (optionally ``path/step_N``)."""
    path = os.path.abspath(path)
    if step is not None:
        path = os.path.join(path, f"step_{step}")
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, jax.tree.map(np.asarray, state), force=overwrite)
    ckpt.wait_until_finished()
    return path


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore a pytree checkpoint shaped like ``template``."""
    ckpt = ocp.StandardCheckpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    return ckpt.restore(os.path.abspath(path), abstract)


def latest_checkpoint_step(base: str) -> int | None:
    if not os.path.isdir(base):
        return None
    steps = [
        int(d.split("_", 1)[1])
        for d in os.listdir(base)
        if d.startswith("step_") and d.split("_", 1)[1].isdigit()
    ]
    return max(steps) if steps else None
