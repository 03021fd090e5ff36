"""Property-classifier training entry point.

The reference evaluates conditional generation with a *pretrained* torch
EGNN classifier (Zenodo download) and ships a training function its entry
points never call (/root/reference/src/__init__.py:145-205).  This CLI
makes the conditional protocol self-contained: train the JAX
``EGNNClassifier`` on a QM9 property (on the FIRST half of the seed-42
re-split, the half the conditional generator never sees), save it in the
classifier.npz/classifier.json format the conditional eval CLI accepts as
``classifier_model_dir``.

Usage:
  python -m bio_diffusion_tpu.cli.train_classifier property=alpha \
      [epochs=100] [hidden_nf=128] [n_layers=7] [output_dir=...] [k=v ...]
"""

from __future__ import annotations

import json
import os
import sys

from bio_diffusion_tpu.cli.common import parse_cli
from bio_diffusion_tpu.config.build import build_datasets, build_experiment
from bio_diffusion_tpu.config.schema import compute_num_atom_types
from bio_diffusion_tpu.train.classifier_train import (
    save_jax_classifier,
    train_property_classifier,
)
from bio_diffusion_tpu.utils.logging import get_logger

log = get_logger(__name__)


def main(argv=None):
    cfg, flags = parse_cli(list(sys.argv[1:] if argv is None else argv), "train_classifier")
    prop = str(cfg.get("property", "alpha"))

    dm = cfg.setdefault("datamodule", {}).setdefault("dataloader_cfg", {})
    if str(dm.get("dataset", "QM9")) == "QM9":
        # classifier trains on the half the conditional generator never saw
        # (reference README.md:249; edm/utils.py QM9_first_half); synthetic
        # or explicit half-splits pass through unchanged
        dm["dataset"] = "QM9_first_half"
    exp = build_experiment(cfg)
    datasets = build_datasets(exp)

    classifier, params, norms, history = train_property_classifier(
        datasets,
        prop,
        num_atom_types=compute_num_atom_types(exp.dataloader_cfg),
        hidden_nf=int(cfg.get("hidden_nf", 128)),
        n_layers=int(cfg.get("n_layers", 7)),
        attention=bool(cfg.get("attention", True)),
        epochs=int(cfg.get("epochs", 100)),
        batch_size=int(cfg.get("batch_size", 96)),
        lr=float(cfg.get("lr", 1e-3)),
        weight_decay=float(cfg.get("weight_decay", 1e-16)),
        seed=int(cfg.get("seed", 0)),
    )

    out_dir = os.path.join(str(cfg.get("output_dir", "outputs/train_classifier")), prop)
    save_jax_classifier(out_dir, classifier, params, norms, prop,
                        extra={"dataset": exp.dataloader_cfg.dataset})
    with open(os.path.join(out_dir, "history.json"), "w") as f:
        json.dump(history, f, indent=2)
    result = {
        "property": prop,
        "model_dir": out_dir,
        "best_valid_mae": history.get("best_valid_mae"),
    }
    log.info(f"Classifier saved: {result}")
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
