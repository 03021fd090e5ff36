"""Orbax checkpointing for TrainState (+ EMA) with resume support.

Counterpart of the reference's Lightning checkpoints + paired ``*-EMA.ckpt``
files (src/utils/__init__.py:238-271): one orbax checkpoint holds params,
EMA params, optimizer state, step, and the grad-norm history, so resume is
exact.  Reference-format torch checkpoints are handled separately by
``bio_diffusion_tpu.train.torch_import``.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from bio_diffusion_tpu.train.state import TrainState


def _manager(ckpt_dir: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(ckpt_dir: str, state: TrainState, step: Optional[int] = None,
                    max_to_keep: int = 3, metrics: Optional[dict] = None) -> None:
    step = int(state.step) if step is None else int(step)
    with _manager(ckpt_dir, max_to_keep) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state), metrics=metrics)
        mgr.wait_until_finished()


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    with _manager(ckpt_dir) as mgr:
        return mgr.latest_step()


def restore_checkpoint(ckpt_dir: str, template: TrainState, step: Optional[int] = None) -> TrainState:
    """Restore a TrainState; ``template`` supplies the tree structure/shapes."""
    with _manager(ckpt_dir) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"No checkpoint found under {ckpt_dir}")
        return mgr.restore(step, args=ocp.args.StandardRestore(template))


def save_params(path: str, params: Any) -> None:
    """Standalone params-only checkpoint (e.g. exported EMA weights)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params)
    ckptr.wait_until_finished()


def restore_params(path: str, template: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
