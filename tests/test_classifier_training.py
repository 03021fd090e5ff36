"""Property-classifier training (VERDICT r3 #4): the JAX counterpart of the
reference's train_with_property_classifier (/root/reference/src/__init__.py:
145-205), making the conditional protocol self-contained — no unreachable
pretrained torch checkpoint needed for a discriminating MAE.
"""

import json
import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # classifier training loop e2e — excluded from `make test-fast`


def _small_synthetic():
    from bio_diffusion_tpu.data.synthetic import synthetic_qm9_like

    return {
        "train": synthetic_qm9_like(192, max_nodes=16, seed=0),
        "valid": synthetic_qm9_like(64, max_nodes=16, seed=1),
    }


def test_train_property_classifier_learns():
    """Trained MAE must beat the predict-the-mean baseline decisively on a
    structure-correlated property (alpha ~ atom count in the synthetic data)."""
    from bio_diffusion_tpu.train.classifier_train import train_property_classifier

    datasets = _small_synthetic()
    classifier, params, norms, history = train_property_classifier(
        datasets, "alpha", num_atom_types=5, hidden_nf=32, n_layers=2,
        epochs=30, batch_size=48, lr=3e-3, seed=0,
    )
    labels = datasets["valid"].property_values("alpha")
    baseline_mae = float(np.abs(labels - norms["mean"]).mean())
    assert history["best_valid_mae"] is not None
    assert history["best_valid_mae"] < 0.5 * baseline_mae, (
        f"trained MAE {history['best_valid_mae']:.3f} vs mean-baseline "
        f"{baseline_mae:.3f}"
    )
    # training loss decreased
    assert history["train_loss"][-1] < history["train_loss"][0]


def test_classifier_save_load_roundtrip(tmp_path):
    """save_jax_classifier/load_jax_classifier preserve predictions exactly
    and carry the property normalizer."""
    import jax.numpy as jnp

    from bio_diffusion_tpu.train.classifier_train import (
        load_jax_classifier, save_jax_classifier, train_property_classifier,
    )

    datasets = _small_synthetic()
    classifier, params, norms, _ = train_property_classifier(
        datasets, "alpha", num_atom_types=5, hidden_nf=16, n_layers=1,
        epochs=1, batch_size=48, seed=0,
    )
    out = save_jax_classifier(str(tmp_path / "cls"), classifier, params, norms, "alpha")
    cls2, params2, meta = load_jax_classifier(out)
    assert meta["property"] == "alpha"
    assert meta["mean"] == pytest.approx(norms["mean"])
    assert meta["mad"] == pytest.approx(norms["mad"])

    rng = np.random.default_rng(0)
    h = jnp.asarray(np.eye(5, dtype=np.float32)[rng.integers(0, 5, (3, 10))])
    x = jnp.asarray(rng.normal(size=(3, 10, 3)).astype(np.float32))
    m = jnp.ones((3, 10))
    p1 = np.asarray(classifier.apply(params, h, x, m))
    p2 = np.asarray(cls2.apply(params2, h, x, m))
    np.testing.assert_array_equal(p1, p2)


def test_train_classifier_cli_then_conditional_eval(tmp_path):
    """End-to-end self-contained conditional protocol: train a classifier
    through the CLI on synthetic data, then run the conditional eval CLI
    with it — the trained classifier's MAE must beat the random-classifier
    fallback's on the same conditioned samples (VERDICT r3 #4 'done'
    criterion)."""
    from bio_diffusion_tpu.cli.mol_gen_eval_conditional_qm9 import main as cond_main
    from bio_diffusion_tpu.cli.train_classifier import main as cls_main

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

    cls_out = str(tmp_path / "classifier")
    res = cls_main([
        "datamodule.dataloader_cfg.dataset=synthetic",
        "property=alpha", "hidden_nf=32", "n_layers=2", "epochs=6",
        "batch_size=48", "lr=2e-3", f"output_dir={cls_out}",
    ])
    model_dir = res["model_dir"]
    assert os.path.isfile(os.path.join(model_dir, "classifier.npz"))
    assert os.path.isfile(os.path.join(model_dir, "classifier.json"))
    assert np.isfinite(res["best_valid_mae"])

    seed_args = ["seed=11"]  # identical sampled molecules in both runs
    out_trained = str(tmp_path / "cond_trained")
    trained = cond_main(TINY + seed_args + [
        "property=alpha", "iterations=2", "batch_size=4", "num_timesteps=5",
        f"classifier_model_dir={model_dir}", f"output_dir={out_trained}",
    ])
    out_random = str(tmp_path / "cond_random")
    random = cond_main(TINY + seed_args + [
        "property=alpha", "iterations=2", "batch_size=4", "num_timesteps=5",
        f"output_dir={out_random}",
    ])
    assert np.isfinite(trained["mae"]) and np.isfinite(random["mae"])
    assert trained["mae"] < random["mae"], (
        f"trained classifier MAE {trained['mae']:.3f} must beat random "
        f"fallback {random['mae']:.3f}"
    )
