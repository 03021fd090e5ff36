"""Hyperparameter search, K8s job generation, and logger backends.

Counterparts of the reference's Optuna sweeper
(configs/hparams_search/qm9_optuna.yaml), Nautilus job generators
(scripts/nautilus/generate_*_jobs.py), and six logger backends
(configs/logger/*).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

from bio_diffusion_tpu.utils.hparam import (
    Study, parse_dimension, read_metric_from_csv,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# hparam search
# ---------------------------------------------------------------------------


def test_parse_dimension_syntax():
    d = parse_dimension("interval(1e-5, 1e-2, log)")
    assert d.kind == "interval" and d.log and d.low == 1e-5
    d = parse_dimension("choice(32, 64, 128)")
    assert d.kind == "choice" and d.choices == [32, 64, 128]
    d = parse_dimension("int_interval(2, 9)")
    assert d.kind == "int_interval" and not d.log
    d = parse_dimension([0.1, "adam"])
    assert d.choices == [0.1, "adam"]


def test_random_sampling_in_bounds():
    space = {
        "lr": "interval(1e-5, 1e-2, log)",
        "bs": "choice(32, 64)",
        "layers": "int_interval(2, 9)",
    }
    study = Study(space, sampler="random", seed=0)
    for _ in range(20):
        p = study.suggest()
        assert 1e-5 <= p["lr"] <= 1e-2
        assert p["bs"] in (32, 64)
        assert isinstance(p["layers"], int) and 2 <= p["layers"] <= 9


def test_tpe_converges_on_quadratic(tmp_path):
    """TPE-lite beats random on a smooth 1-d objective: after warmup its
    suggestions concentrate near the optimum."""
    space = {"x": "interval(0, 10)"}

    def run(sampler):
        study = Study(space, sampler=sampler, n_startup_trials=8, seed=1)
        for _ in range(40):
            p = study.suggest()
            study.record(p, (p["x"] - 3.0) ** 2)
        tail = [t["params"]["x"] for t in study.trials[-10:]]
        return study.best_trial(), np.mean(np.abs(np.asarray(tail) - 3.0))

    best_tpe, tail_dist_tpe = run("tpe")
    assert abs(best_tpe["params"]["x"] - 3.0) < 1.0
    # late TPE suggestions cluster near the optimum
    assert tail_dist_tpe < 2.5


def test_study_persistence_and_resume(tmp_path):
    path = str(tmp_path / "study.json")
    s1 = Study({"x": "interval(0, 1)"}, path=path, sampler="random")
    p = s1.suggest()
    s1.record(p, 0.5)
    s2 = Study({"x": "interval(0, 1)"}, path=path, sampler="random")
    assert len(s2.trials) == 1 and s2.best_trial()["value"] == 0.5


def test_read_metric_from_csv(tmp_path):
    path = str(tmp_path / "metrics.csv")
    with open(path, "w") as f:
        f.write("step,epoch,val/loss\n1,0,5.0\n2,1,3.0\n3,2,4.0\n")
    assert read_metric_from_csv(path, "val/loss", "last") == 4.0
    assert read_metric_from_csv(path, "val/loss", "min") == 3.0
    with pytest.raises(KeyError):
        read_metric_from_csv(path, "nope")


@pytest.mark.slow  # 94s: full TPE search over real training runs
def test_hparam_search_script_end_to_end(tmp_path):
    """Drive scripts/hparam_search.py with a stub objective via a tiny
    synthetic train run config (1 epoch, 2 trials)."""
    space = {"model.optimizer.lr": "choice(0.001, 0.0001)"}
    space_path = str(tmp_path / "space.json")
    with open(space_path, "w") as f:
        json.dump(space, f)
    out_dir = str(tmp_path / "search")

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import hparam_search
    finally:
        sys.path.pop(0)
    hparam_search.main([
        space_path, out_dir,
        "--n-trials", "2", "--metric", "train/loss", "--sampler", "random",
        "--max-epochs", "1",
        "--",
        "datamodule.dataloader_cfg.dataset=synthetic",
        "datamodule.dataloader_cfg.batch_size=8",
        "model.model_cfg.h_hidden_dim=16",
        "model.model_cfg.chi_hidden_dim=4",
        "model.model_cfg.e_hidden_dim=8",
        "model.model_cfg.xi_hidden_dim=2",
        "model.model_cfg.num_encoder_layers=1",
        "model.diffusion_cfg.num_timesteps=10",
        "model.diffusion_cfg.sample_during_training=false",
        "trainer.use_mesh=false",
        "trainer.check_val_every_n_epoch=100",
        "trainer.early_stopping_monitor=",
    ])
    with open(os.path.join(out_dir, "study.json")) as f:
        study = json.load(f)
    done = [t for t in study["trials"] if t.get("value") is not None]
    assert len(done) == 2 and all(np.isfinite(t["value"]) for t in done)
    assert os.path.isfile(os.path.join(out_dir, "best_trial.json"))


# ---------------------------------------------------------------------------
# K8s job generation
# ---------------------------------------------------------------------------


def _load_gen():
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import generate_k8s_jobs
    finally:
        sys.path.pop(0)
    return generate_k8s_jobs


def test_k8s_single_experiment(tmp_path):
    gen = _load_gen()
    out = str(tmp_path / "k8s")
    paths = gen.main(["--experiment", "qm9_mol_gen_ddpm", "--out-dir", out])
    assert len(paths) == 2
    for p in paths:
        with open(p) as f:
            doc = yaml.safe_load(f)
        assert doc["kind"] in ("Job", "PersistentVolumeClaim")
    job = yaml.safe_load(open(os.path.join(out, "job_qm9_mol_gen_ddpm.yaml")))
    ctr = job["spec"]["template"]["spec"]["containers"][0]
    assert ctr["resources"]["limits"]["google.com/tpu"] == 4
    assert "bio_diffusion_tpu.cli.train" in ctr["command"][-1]
    assert os.path.isfile(os.path.join(out, "apply_all.sh"))


def test_k8s_from_grid_manifest_multihost(tmp_path):
    gen = _load_gen()
    manifest = [
        {"run_id": "run_0000", "overrides": {}, "cmd": "python -m bio_diffusion_tpu.cli.train a=1"},
        {"run_id": "run_0001", "overrides": {}, "cmd": "python -m bio_diffusion_tpu.cli.train a=2"},
    ]
    mpath = str(tmp_path / "grid_manifest.json")
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    out = str(tmp_path / "k8s")
    paths = gen.main([
        "--manifest", mpath, "--out-dir", out,
        "--num-hosts", "4", "--chips-per-host", "4", "--topology", "4x4",
    ])
    # PVC + 2x(Job + headless Service): multi-host jobs need per-pod DNS
    assert len(paths) == 5
    svc = yaml.safe_load(open(os.path.join(out, "service_run_0000.yaml")))
    assert svc["kind"] == "Service" and svc["spec"]["clusterIP"] == "None"
    assert svc["spec"]["selector"]["job-name"] == svc["metadata"]["name"]
    assert svc["spec"]["ports"][0]["port"] == 8476
    job = yaml.safe_load(open(os.path.join(out, "job_run_0000.yaml")))
    spec = job["spec"]
    assert spec["completions"] == 4 and spec["parallelism"] == 4
    cmd = spec["template"]["spec"]["containers"][0]["command"][-1]
    assert "trainer.multihost=true" in cmd
    sel = spec["template"]["spec"]["nodeSelector"]
    assert sel["cloud.google.com/gke-tpu-topology"] == "4x4"


def test_k8s_unsubstituted_variable_raises():
    gen = _load_gen()
    with pytest.raises(ValueError, match="unsubstituted"):
        gen.render("image: $NOT_A_VAR", {})


# ---------------------------------------------------------------------------
# loggers
# ---------------------------------------------------------------------------


def test_jsonl_and_tensorboard_loggers(tmp_path):
    from bio_diffusion_tpu.utils.logging import JSONLLogger, TensorBoardLogger

    jl = JSONLLogger(str(tmp_path / "m.jsonl"))
    jl.log({"train/loss": 1.5}, step=1, epoch=0)
    jl.log({"train/loss": 1.2}, step=2, epoch=0)
    rows = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    assert rows[1]["train/loss"] == 1.2 and rows[1]["step"] == 2

    tb = TensorBoardLogger(str(tmp_path / "tb"))
    tb.log({"train/loss": 1.5}, step=1)
    tb.finish()
    files = os.listdir(tmp_path / "tb")
    assert any("tfevents" in f for f in files)


def test_build_loggers_from_config(tmp_path):
    from bio_diffusion_tpu.utils.logging import (
        CSVLogger, JSONLLogger, MetricLoggers, TensorBoardLogger, build_loggers,
    )

    loggers = build_loggers(
        {"csv": {}, "jsonl": {}, "tensorboard": {}, "mlflow": {}, "bogus": {}},
        str(tmp_path),
    )
    kinds = [type(l).__name__ for l in loggers.loggers]
    assert "CSVLogger" in kinds and "JSONLLogger" in kinds and "TensorBoardLogger" in kinds
    # mlflow package is absent in this image -> backend attaches but no-ops
    loggers.log({"x": 1.0}, step=0, epoch=0)
    loggers.finish()
    assert os.path.isfile(tmp_path / "metrics.csv")


def test_logger_config_group_composes():
    from bio_diffusion_tpu.config.loader import default_config_dir, load_config

    cfg = load_config(default_config_dir(), "train", ["logger=many_loggers"])
    assert set(cfg["logger"].keys()) >= {"csv", "tensorboard", "jsonl"}


def test_print_config_tree_and_tags():
    from bio_diffusion_tpu.utils.logging import enforce_tags, print_config_tree

    text = print_config_tree({"a": {"b": 1}, "c": "x"})
    assert "b" in text and "c" in text
    enforce_tags({"tags": ["real-run"]}, strict=True)  # ok
    with pytest.raises(ValueError):
        enforce_tags({"tags": []}, strict=True)
    enforce_tags({}, strict=False)  # warns only
