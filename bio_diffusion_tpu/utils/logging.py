"""Lightweight metric logging: CSV always, wandb when available/configured.

Counterpart of the reference's pluggable Lightning loggers (configs/logger/*);
CSV is the always-on backend, wandb attaches when the package+env exist.
"""

from __future__ import annotations

import csv
import json
import logging
import os
import sys
import time
from typing import Any, Dict, Optional


def get_logger(name: str) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter("[%(asctime)s][%(name)s][%(levelname)s] %(message)s"))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger


class CSVLogger:
    """Append-only CSV metrics log (one row per log call, sparse columns)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._columns = ["step", "epoch", "time"]
        self._rows = []

    def log(self, metrics: Dict[str, Any], step: int, epoch: Optional[int] = None):
        row = {"step": step, "epoch": epoch, "time": time.time()}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                row[k] = str(v)
            if k not in self._columns:
                self._columns.append(k)
        self._rows.append(row)
        self._flush()

    def _flush(self):
        with open(self.path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self._columns)
            writer.writeheader()
            for row in self._rows:
                writer.writerow(row)


class WandbLogger:
    """Optional wandb backend; silently disabled if wandb is unavailable."""

    def __init__(self, project: str, name: Optional[str] = None, config: Optional[Dict] = None):
        self.run = None
        try:
            import wandb

            self.run = wandb.init(project=project, name=name, config=config)
        except Exception:
            pass

    def log(self, metrics: Dict[str, Any], step: int, epoch: Optional[int] = None):
        if self.run is not None:
            self.run.log({k: v for k, v in metrics.items()}, step=step)

    def finish(self):
        if self.run is not None:
            self.run.finish()


class MetricLoggers:
    def __init__(self, *loggers):
        self.loggers = [l for l in loggers if l is not None]

    def log(self, metrics: Dict[str, Any], step: int, epoch: Optional[int] = None):
        for l in self.loggers:
            l.log(metrics, step=step, epoch=epoch)


def grad_flow_summary(grads) -> Dict[str, float]:
    """Per-layer mean absolute gradients (reference log_grad_flow_lite,
    src/models/__init__.py:132-161 — the gradient-vanishing diagnostic).

    Returns {dotted/param/path: mean |grad|}, cheap enough to log every N
    steps; pair with CSV/wandb loggers.
    """
    import jax
    import numpy as np

    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
        name = jax.tree_util.keystr(path).strip("[]'").replace("']['", "/")
        if "bias" in name:
            continue
        out[name] = float(np.mean(np.abs(np.asarray(leaf))))
    return out
