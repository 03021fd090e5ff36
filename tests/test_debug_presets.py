"""Debug presets: fdr / limit / overfit / profiler config overlays and the
trainer batch-limit knobs (reference configs/debug/*)."""

import csv
import os

import numpy as np
import pytest

from bio_diffusion_tpu.config.build import build_experiment
from bio_diffusion_tpu.config.loader import default_config_dir, load_config

TINY = [
    "datamodule.dataloader_cfg.dataset=synthetic",
    "datamodule.dataloader_cfg.batch_size=16",
    "model.model_cfg.h_hidden_dim=16",
    "model.model_cfg.chi_hidden_dim=4",
    "model.model_cfg.e_hidden_dim=8",
    "model.model_cfg.xi_hidden_dim=2",
    "model.model_cfg.num_encoder_layers=1",
    "model.diffusion_cfg.num_timesteps=10",
    "model.diffusion_cfg.sample_during_training=false",
    "trainer.use_mesh=false",
    "trainer.early_stopping_monitor=",
    "extras.print_config=false",
]


def _rows(workdir):
    with open(os.path.join(workdir, "metrics.csv")) as f:
        return list(csv.DictReader(f))


def test_debug_overlays_compose():
    cfg = load_config(default_config_dir(), "train", ["debug=fdr"])
    exp = build_experiment(cfg)
    assert exp.trainer.fast_dev_run and exp.trainer.detect_anomaly
    assert exp.diffusion_cfg.debug_invariants  # detect_anomaly wires it in
    cfg = load_config(default_config_dir(), "train", ["debug=limit"])
    exp = build_experiment(cfg)
    assert exp.trainer.limit_train_batches == 0.01
    assert exp.trainer.limit_val_batches == 0.05
    cfg = load_config(default_config_dir(), "train", ["debug=overfit"])
    exp = build_experiment(cfg)
    assert exp.trainer.overfit_batches == 3 and exp.trainer.max_epochs == 20


def test_fast_dev_run(tmp_path):
    """debug=fdr: one train + one val batch, no checkpoints written."""
    from bio_diffusion_tpu.cli.train import main

    wd = str(tmp_path / "run")
    main(TINY + ["debug=fdr", f"--workdir={wd}"])
    rows = _rows(wd)
    train_rows = [r for r in rows if r.get("train/loss")]
    val_rows = [r for r in rows if r.get("valid/loss")]
    assert len(train_rows) == 1 and len(val_rows) == 1
    # exactly one optimizer step ran
    assert int(train_rows[0]["step"]) == 1
    assert not os.path.isdir(os.path.join(wd, "checkpoints"))


def test_limit_batches(tmp_path):
    """Absolute-count train limit: 2 batches per epoch."""
    from bio_diffusion_tpu.cli.train import main

    wd = str(tmp_path / "run")
    main(TINY + ["trainer.limit_train_batches=2", f"--workdir={wd}", "--max-epochs=2"])
    rows = _rows(wd)
    train_rows = [r for r in rows if r.get("train/loss")]
    # 2 epochs x 2 batches
    assert int(train_rows[-1]["step"]) == 4


def test_overfit_batches_loss_decreases(tmp_path):
    """overfit_batches=2: same batches every epoch, loss drops over epochs."""
    from bio_diffusion_tpu.cli.train import main

    wd = str(tmp_path / "run")
    main(TINY + [
        "trainer.overfit_batches=2",
        "model.optimizer.lr=1e-3",
        f"--workdir={wd}", "--max-epochs=8",
    ])
    rows = _rows(wd)
    losses = [float(r["train/loss"]) for r in rows if r.get("train/loss")]
    assert len(losses) == 8
    assert losses[-1] < losses[0], f"no overfitting progress: {losses}"


def test_fraction_limit_val(tmp_path):
    """Fractional val limit uses a strict subset of the val batches."""
    import jax

    from bio_diffusion_tpu.train.loop import Trainer

    cfg = load_config(default_config_dir(), "train", TINY + [
        "trainer.limit_val_batches=0.3",
    ])
    exp = build_experiment(cfg)
    tr = Trainer(exp, str(tmp_path / "run"))
    full = len(list(tr._batch_iter("valid", shuffle=False)))
    limited = len(list(tr._limited(tr._batch_iter("valid", shuffle=False), 0.3, split="valid")))
    assert 1 <= limited < full
    assert limited == max(1, int(full * 0.3))


def test_limit_batches_int_one(tmp_path):
    """Lightning int semantics: limit_train_batches=1 (int) caps at ONE batch
    per epoch; float 1.0 means the full split (ADVICE r2)."""
    from bio_diffusion_tpu.cli.train import main

    wd = str(tmp_path / "one")
    main(TINY + ["trainer.limit_train_batches=1", f"--workdir={wd}", "--max-epochs=1"])
    assert int(_rows(wd)[0]["step"]) == 1
