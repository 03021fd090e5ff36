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


def restore_raw(ckpt_dir: str, step: Optional[int] = None) -> Any:
    """Restore a checkpoint as a raw nested dict, without a template.

    Building block for partial (strict=False) warm starts: the caller
    intersects the result with a freshly-initialized tree.
    """
    with _manager(ckpt_dir) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"No checkpoint found under {ckpt_dir}")
        return mgr.restore(step)


def merge_partial(template: Any, loaded: Any, _path: str = "") -> tuple:
    """Tree-intersection merge: every leaf path present in both ``template``
    and ``loaded`` with a matching shape takes the loaded value; everything
    else keeps the template's (freshly-initialized) value.

    The JAX counterpart of the reference's ``strict=False`` state_dict warm
    start (/root/reference/src/train.py:91-106).  Returns
    ``(merged, loaded_paths, skipped_paths)``.
    """
    loaded_paths: list = []
    skipped_paths: list = []

    def rec(tmpl, raw, path):
        if isinstance(tmpl, dict) or hasattr(tmpl, "items"):
            out = {}
            raw_map = raw if isinstance(raw, dict) else {}
            for k, v in tmpl.items():
                if k in raw_map:
                    out[k] = rec(v, raw_map[k], f"{path}/{k}")
                else:
                    skipped_paths.append(f"{path}/{k}")
                    out[k] = v
            return type(tmpl)(out) if not isinstance(tmpl, dict) else out
        # leaf
        t_shape = getattr(tmpl, "shape", None)
        r_shape = getattr(raw, "shape", None)
        if raw is not None and t_shape == r_shape:
            loaded_paths.append(path)
            return jax.numpy.asarray(raw, dtype=getattr(tmpl, "dtype", None))
        skipped_paths.append(path)
        return tmpl

    merged = rec(template, loaded, _path)
    return merged, loaded_paths, skipped_paths


def warm_start_params(ckpt_path: str, params: Any, step: Optional[int] = None,
                      source: str = "params") -> tuple:
    """Partial params restore from an orbax checkpoint dir or a torch ``.ckpt``.

    ``source`` selects which weight set to pull from a full TrainState
    checkpoint ("params" or "ema_params"); params-only checkpoints and torch
    Lightning checkpoints are detected automatically.  Returns
    ``(merged_params, n_loaded, skipped_paths)``.
    """
    if ckpt_path.endswith((".ckpt", ".pt", ".pth")):
        # reference Lightning checkpoints go through the name-mapping importer,
        # non-strict (that's the whole point of a warm start)
        from bio_diffusion_tpu.train.torch_import import import_torch_checkpoint

        loaded = import_torch_checkpoint(ckpt_path, params, strict=False)
    else:
        loaded = restore_raw(ckpt_path, step=step)
        # full TrainState layout -> pick the requested weight set
        if isinstance(loaded, dict) and {"opt_state", "step", source} <= set(loaded.keys()):
            loaded = loaded[source]
    merged, loaded_paths, skipped = merge_partial(params, loaded)
    return merged, len(loaded_paths), skipped


def save_params(path: str, params: Any) -> None:
    """Standalone params-only checkpoint (e.g. exported EMA weights)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params)
    ckptr.wait_until_finished()


def restore_params(path: str, template: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
