"""Experiment-glob sweep smoke tests (counterpart of reference
tests/test_sweeps.py:14-94): EVERY configs/experiment/* trains one
fast_dev_run step through cli.train.main, so no experiment config can rot
silently.  Datasets are swapped to the hermetic synthetic stand-in (QM9 and
GEOM real data are unreachable offline) and the model is shrunk — the
composition path (defaults, overrides, interpolations) runs unmodified."""

import glob
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-run sweep e2e — excluded from `make test-fast`

CONFIG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs"
)
EXPERIMENTS = sorted(
    os.path.splitext(os.path.basename(p))[0]
    for p in glob.glob(os.path.join(CONFIG_DIR, "experiment", "*.yaml"))
)

SHRINK = [
    "datamodule.dataloader_cfg.dataset=synthetic",
    # the synthetic stand-in is QM9-schema: 5 atom types (GEOM configs set 16)
    "datamodule.dataloader_cfg.num_atom_types=5",
    "datamodule.dataloader_cfg.batch_size=8",
    "model.model_cfg.h_hidden_dim=16",
    "model.model_cfg.chi_hidden_dim=4",
    "model.model_cfg.e_hidden_dim=8",
    "model.model_cfg.xi_hidden_dim=2",
    "model.model_cfg.num_encoder_layers=1",
    "model.diffusion_cfg.num_timesteps=10",
    "model.diffusion_cfg.sample_during_training=false",
    "trainer.use_mesh=false",
    "extras.print_config=false",
]


def test_experiment_glob_is_nonempty():
    assert len(EXPERIMENTS) >= 3, EXPERIMENTS


@pytest.mark.parametrize("experiment", EXPERIMENTS)
def test_experiment_fast_dev_run(experiment, tmp_path):
    from bio_diffusion_tpu.cli.train import main

    workdir = str(tmp_path / experiment)
    main([f"experiment={experiment}", "debug=fdr"] + SHRINK + [
        f"--workdir={workdir}",
    ])
    import csv

    with open(os.path.join(workdir, "metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    losses = [float(r["train/loss"]) for r in rows if r.get("train/loss")]
    assert losses and np.isfinite(losses).all()
