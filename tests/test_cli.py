"""CLI smoke tests (counterpart of the reference's fast_dev_run train tests,
train->eval checkpoint round trip, and sample CLI)."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # train-CLI e2e — excluded from `make test-fast`

TINY = [
    "datamodule.dataloader_cfg.dataset=synthetic",
    "datamodule.dataloader_cfg.batch_size=16",
    "model.model_cfg.h_hidden_dim=16",
    "model.model_cfg.chi_hidden_dim=4",
    "model.model_cfg.e_hidden_dim=8",
    "model.model_cfg.xi_hidden_dim=2",
    "model.model_cfg.num_encoder_layers=1",
    "model.diffusion_cfg.num_timesteps=10",
]


def test_train_and_resume(tmp_path):
    from bio_diffusion_tpu.cli.train import main

    workdir = str(tmp_path / "run")
    args = TINY + [
        "model.diffusion_cfg.sample_during_training=false",
        "trainer.check_val_every_n_epoch=1",
        f"--workdir={workdir}",
        "--max-epochs=1",
    ]
    main(args)
    assert os.path.exists(os.path.join(workdir, "metrics.csv"))
    ckpts = os.listdir(os.path.join(workdir, "checkpoints"))
    assert len(ckpts) >= 1

    # resume continues from the saved step
    main(args)
    with open(os.path.join(workdir, "metrics.csv")) as f:
        assert "train/loss" in f.readline()


def test_train_with_halt_file(tmp_path):
    from bio_diffusion_tpu.cli.train import main

    grid_dir = str(tmp_path / "grid")
    main(TINY + [
        "model.diffusion_cfg.sample_during_training=false",
        f"paths.grid_search_script_dir={grid_dir}",
        "task_name=gridrun",
        f"--workdir={tmp_path / 'run2'}",
        "--max-epochs=1",
    ])
    assert os.path.exists(os.path.join(grid_dir, "gridrun.done"))


def test_sample_cli_from_trained_checkpoint(tmp_path, capsys):
    from bio_diffusion_tpu.cli.mol_gen_sample import main as sample_main
    from bio_diffusion_tpu.cli.train import main as train_main

    workdir = str(tmp_path / "run")
    train_main(TINY + [
        "model.diffusion_cfg.sample_during_training=false",
        f"--workdir={workdir}", "--max-epochs=1",
    ])
    out_dir = str(tmp_path / "samples")
    metrics = sample_main(TINY + [
        f"ckpt_path={os.path.join(workdir, 'checkpoints')}",
        "num_samples=4", "sampling_batch_size=4", f"output_dir={out_dir}",
    ])
    assert "mol_stable" in metrics
    xyz = [f for root, _, fs in os.walk(out_dir) for f in fs if f.endswith(".xyz")]
    assert len(xyz) == 4


def test_sample_cli_chain_mode(tmp_path):
    """ddpm_mode=chain writes subsampled chain frames + a GIF (reference
    sample_chain_and_save, qm9_mol_gen_ddpm.py:956-1060)."""
    from bio_diffusion_tpu.cli.mol_gen_sample import main as sample_main

    out_dir = str(tmp_path / "chain")
    metrics = sample_main(TINY + [
        "ddpm_mode=chain", "num_nodes=6", "keep_frames=5",
        f"output_dir={out_dir}",
    ])
    assert "mol_stable" in metrics
    frames = [f for root, _, fs in os.walk(out_dir) for f in fs
              if f.startswith("chain") and f.endswith(".xyz")]
    # 5 kept frames (stride 2 over T=10) + 10 repeats of the final frame
    assert len(frames) == 15
    gifs = [f for root, _, fs in os.walk(out_dir) for f in fs if f.endswith(".gif")]
    assert len(gifs) == 1


def test_inference_mesh_toggle():
    """use_mesh parses with the schema's bool allowlist: default on (8
    virtual devices here), any non-allowlisted string (incl. typos) is
    false -> single-device."""
    from bio_diffusion_tpu.cli.common import inference_mesh

    assert inference_mesh({}) is not None
    assert inference_mesh({"use_mesh": True}) is not None
    assert inference_mesh({"use_mesh": "false"}) is None
    assert inference_mesh({"use_mesh": False}) is None
    assert inference_mesh({"use_mesh": "flase"}) is None  # typo != enabled
    mesh = inference_mesh(None)
    assert mesh is not None and mesh.shape["data"] == 8
