"""Lightweight metric logging: CSV always; wandb / tensorboard / jsonl /
mlflow / comet / neptune attach when the package+config exist.

Counterpart of the reference's six pluggable Lightning logger backends
(configs/logger/{csv,wandb,tensorboard,comet,mlflow,neptune}.yaml) plus its
rich config-tree printing and tag enforcement (src/utils/rich_utils.py).
CSV is the always-on backend; the rest are built by :func:`build_loggers`
from the composed ``logger`` config group and silently skip when their
package is unavailable (matching this image: tensorboardX present, the
hosted services absent).
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


class JSONLLogger:
    """Append-only JSON-lines metrics log (machine-readable, no schema churn)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def log(self, metrics: Dict[str, Any], step: int, epoch: Optional[int] = None):
        row = {"step": step, "epoch": epoch, "time": time.time()}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                row[k] = str(v)
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")


class TensorBoardLogger:
    """TensorBoard event files via tensorboardX (present in this image);
    silently disabled when unavailable."""

    def __init__(self, log_dir: str):
        self.writer = None
        try:
            from tensorboardX import SummaryWriter

            os.makedirs(log_dir, exist_ok=True)
            self.writer = SummaryWriter(log_dir)
        except Exception:
            pass

    def log(self, metrics: Dict[str, Any], step: int, epoch: Optional[int] = None):
        if self.writer is None:
            return
        for k, v in metrics.items():
            try:
                self.writer.add_scalar(k, float(v), step)
            except (TypeError, ValueError):
                pass
        self.writer.flush()

    def finish(self):
        if self.writer is not None:
            self.writer.close()


class MLflowLogger:
    """Optional MLflow backend (reference configs/logger/mlflow.yaml)."""

    def __init__(self, experiment_name: str = "bio-diffusion-tpu",
                 tracking_uri: Optional[str] = None, run_name: Optional[str] = None):
        self.mlflow = None
        try:
            import mlflow

            if tracking_uri:
                mlflow.set_tracking_uri(tracking_uri)
            mlflow.set_experiment(experiment_name)
            mlflow.start_run(run_name=run_name)
            self.mlflow = mlflow
        except Exception:
            pass

    def log(self, metrics: Dict[str, Any], step: int, epoch: Optional[int] = None):
        if self.mlflow is None:
            return
        clean = {}
        for k, v in metrics.items():
            try:
                clean[k.replace("/", "_")] = float(v)
            except (TypeError, ValueError):
                pass
        self.mlflow.log_metrics(clean, step=step)

    def finish(self):
        if self.mlflow is not None:
            self.mlflow.end_run()


class CometLogger:
    """Optional Comet backend (reference configs/logger/comet.yaml)."""

    def __init__(self, project_name: str = "bio-diffusion-tpu", **kwargs):
        self.exp = None
        try:
            import comet_ml

            self.exp = comet_ml.Experiment(project_name=project_name, **kwargs)
        except Exception:
            pass

    def log(self, metrics: Dict[str, Any], step: int, epoch: Optional[int] = None):
        if self.exp is not None:
            self.exp.log_metrics(dict(metrics), step=step, epoch=epoch)

    def finish(self):
        if self.exp is not None:
            self.exp.end()


class NeptuneLogger:
    """Optional Neptune backend (reference configs/logger/neptune.yaml)."""

    def __init__(self, project: Optional[str] = None, **kwargs):
        self.run = None
        try:
            import neptune

            self.run = neptune.init_run(project=project, **kwargs)
        except Exception:
            pass

    def log(self, metrics: Dict[str, Any], step: int, epoch: Optional[int] = None):
        if self.run is None:
            return
        for k, v in metrics.items():
            try:
                self.run[k].append(float(v), step=step)
            except (TypeError, ValueError):
                pass

    def finish(self):
        if self.run is not None:
            self.run.stop()


_LOGGER_FACTORIES = {
    "csv": lambda opts, workdir: CSVLogger(
        opts.get("path") or os.path.join(workdir, "metrics.csv")
    ),
    "jsonl": lambda opts, workdir: JSONLLogger(
        opts.get("path") or os.path.join(workdir, "metrics.jsonl")
    ),
    "tensorboard": lambda opts, workdir: TensorBoardLogger(
        opts.get("save_dir") or os.path.join(workdir, "tensorboard")
    ),
    "wandb": lambda opts, workdir: WandbLogger(
        project=opts.get("project", "bio-diffusion-tpu"), name=opts.get("name")
    ),
    "mlflow": lambda opts, workdir: MLflowLogger(
        experiment_name=opts.get("experiment_name", "bio-diffusion-tpu"),
        tracking_uri=opts.get("tracking_uri"),
    ),
    "comet": lambda opts, workdir: CometLogger(
        project_name=opts.get("project_name", "bio-diffusion-tpu")
    ),
    "neptune": lambda opts, workdir: NeptuneLogger(project=opts.get("project")),
}


def build_loggers(logger_cfg: Optional[Dict[str, Any]], workdir: str) -> "MetricLoggers":
    """Instantiate metric loggers from the composed ``logger`` config group
    (counterpart of the reference's instantiate_loggers, utils/utils.py:124).

    ``logger_cfg`` maps backend name -> options dict (configs/logger/*.yaml);
    CSV is always attached so the Trainer/monitors can read metrics.csv.
    """
    backends = [CSVLogger(os.path.join(workdir, "metrics.csv"))]
    for name, opts in (logger_cfg or {}).items():
        if name == "csv":
            continue  # always-on above
        factory = _LOGGER_FACTORIES.get(name)
        if factory is None:
            get_logger(__name__).warning(f"unknown logger backend {name!r}; skipping")
            continue
        backends.append(factory(opts if isinstance(opts, dict) else {}, workdir))
    return MetricLoggers(*backends)


class MetricLoggers:
    def __init__(self, *loggers):
        self.loggers = [l for l in loggers if l is not None]

    def log(self, metrics: Dict[str, Any], step: int, epoch: Optional[int] = None):
        for l in self.loggers:
            l.log(metrics, step=step, epoch=epoch)

    def finish(self):
        for l in self.loggers:
            if hasattr(l, "finish"):
                l.finish()


def print_config_tree(cfg: Dict[str, Any], title: str = "config") -> str:
    """Render the composed config as a tree (reference rich_utils.print_config_tree,
    src/utils/rich_utils.py:22); uses rich when available, plain text otherwise.
    Returns the rendered string (also printed)."""
    try:
        import io

        from rich.console import Console
        from rich.tree import Tree

        def fill(tree, node):
            for k, v in node.items():
                if isinstance(v, dict):
                    fill(tree.add(f"[bold]{k}[/bold]"), v)
                else:
                    tree.add(f"{k}: {v!r}")

        root = Tree(f":gear: {title}")
        fill(root, cfg)
        buf = io.StringIO()
        Console(file=buf, width=120).print(root)
        text = buf.getvalue()
    except Exception:
        lines = [title]

        def fill_plain(node, indent):
            for k, v in node.items():
                if isinstance(v, dict):
                    lines.append(f"{'  ' * indent}{k}:")
                    fill_plain(v, indent + 1)
                else:
                    lines.append(f"{'  ' * indent}{k}: {v!r}")

        fill_plain(cfg, 1)
        text = "\n".join(lines) + "\n"
    print(text, file=sys.stderr)
    return text


def enforce_tags(cfg: Dict[str, Any], strict: bool = False) -> None:
    """Require experiment tags (reference rich_utils.enforce_tags): warn —
    or raise when ``strict`` — if cfg.tags is missing/empty/['dev']."""
    tags = cfg.get("tags") or []
    if not tags or tags == ["dev"]:
        msg = "no experiment tags set (cfg.tags); use tags=[...] to label runs"
        if strict:
            raise ValueError(msg)
        get_logger(__name__).warning(msg)


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
