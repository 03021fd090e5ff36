"""Profiling hooks: jax.profiler traces + wall-clock timing harness.

TPU-native counterpart of the reference's Lightning profiler configs
(configs/debug/profiler.yaml, trainer profiler option) and the torchviz
graph dump: a context manager producing a TensorBoard-loadable trace, and a
block-timing helper that forces completion via host transfer (the remote
PJRT plugin's block_until_ready can return early — see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np

from bio_diffusion_tpu.utils.logging import get_logger

log = get_logger(__name__)


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    try:
        jax.profiler.start_trace(log_dir)
        started = True
        log.info(f"Profiler trace -> {log_dir}")
    except Exception as e:  # remote runtimes may not support tracing
        log.warning(f"Profiler unavailable ({e}); continuing without trace")
        started = False
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock step timer with forced materialization."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.time()

    def stop(self, result=None):
        if result is not None:
            np.asarray(jax.tree_util.tree_leaves(result)[0])  # force completion
        dt = time.time() - self._t0
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else float("nan")


import jax  # noqa: E402  (used by StepTimer.stop)


def dump_computation_graph(fn, args, out_dir: str, name: str = "forward") -> dict:
    """Write the jaxpr and optimized HLO of ``fn(*args)`` to text files.

    TPU-native counterpart of the reference's torchviz graph dump
    (utils/__init__.py:53-68, hooked behind a flag in the EVD forward):
    instead of an autograd graph PNG we save what the compiler actually
    sees — the traced jaxpr and the post-optimization HLO module.
    Returns {'jaxpr': path, 'hlo': path}.
    """
    import os

    import jax

    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    jaxpr_path = os.path.join(out_dir, f"{name}.jaxpr.txt")
    with open(jaxpr_path, "w") as f:
        f.write(str(jax.make_jaxpr(fn)(*args)))
    paths["jaxpr"] = jaxpr_path

    lowered = jax.jit(fn).lower(*args)
    hlo_path = os.path.join(out_dir, f"{name}.hlo.txt")
    try:
        text = lowered.compile().as_text()
    except Exception:  # fall back to pre-optimization StableHLO
        text = lowered.as_text()
    with open(hlo_path, "w") as f:
        f.write(text)
    paths["hlo"] = hlo_path
    return paths
