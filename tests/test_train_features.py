"""Gradient accumulation, early stopping, and CLI mesh wiring.

Covers the reference's accumulate_grad_batches (configs/trainer/
default.yaml:29), EarlyStopping callback (configs/callbacks/
early_stopping.yaml), and DDP-by-default training (configs/trainer/
default.yaml:10) — here: a (data x model) mesh built by the train CLI.
"""

import csv
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bio_diffusion_tpu.config.schema import (
    DataloaderConfig, DiffusionConfig, LayerConfig, ModelConfig, ModuleConfig,
    OptimizerConfig,
)
from bio_diffusion_tpu.data.batch import iterate_dense_batches
from bio_diffusion_tpu.data.synthetic import synthetic_qm9_like
from bio_diffusion_tpu.models.diffusion import EquivariantVariationalDiffusion
from bio_diffusion_tpu.models.distributions import NumNodesDistribution
from bio_diffusion_tpu.models.gcpnet import GCPNetDynamics
from bio_diffusion_tpu.train.state import create_train_state, make_optimizer
from bio_diffusion_tpu.train.step import make_train_step

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
]


def _tiny_setup():
    dc = DiffusionConfig(num_timesteps=10)
    dl = DataloaderConfig()
    net = GCPNetDynamics(
        ModelConfig(h_hidden_dim=16, chi_hidden_dim=4, e_hidden_dim=8, xi_hidden_dim=2,
                    num_encoder_layers=2),
        ModuleConfig(), LayerConfig(), dc, dl, remat_interactions=False,
    )
    evd = EquivariantVariationalDiffusion(dynamics=net, diffusion_cfg=dc, dataloader_cfg=dl)
    ds = synthetic_qm9_like(num_molecules=16, max_nodes=8, seed=0)
    hist = {int(n): int(c) for n, c in zip(*np.unique(ds.data["num_atoms"], return_counts=True))}
    nodes_dist = NumNodesDistribution(hist)
    return evd, dc, dl, ds, nodes_dist


def _batches(ds, batch_size, k):
    rng = np.random.default_rng(0)
    it = iterate_dense_batches(ds, batch_size=batch_size, rng=rng, shuffle=False, pad_to=8)
    return [next(it) for _ in range(k)]


@pytest.mark.slow  # 146s: two full training runs compared step-by-step
def test_grad_accumulation_matches_big_batch():
    """accum(k=4) over 4 micro-batches == one step over their concatenation."""
    evd, dc, dl, ds, nodes_dist = _tiny_setup()
    opt = make_optimizer(OptimizerConfig())
    micro = _batches(ds, batch_size=4, k=4)
    big = _batches(ds, batch_size=16, k=1)[0]

    key = jax.random.PRNGKey(0)
    params = evd.init(
        key, jnp.asarray(big.x), jnp.asarray(big.one_hot), jnp.asarray(big.charges),
        jnp.asarray(big.node_mask), key, training=True,
    )

    step_acc = make_train_step(
        evd, opt, dc, dl, nodes_dist.log_prob_table, donate=False,
        accumulate_grad_batches=4,
    )
    step_big = make_train_step(
        evd, opt, dc, dl, nodes_dist.log_prob_table, donate=False,
    )

    # identical per-micro-batch RNG is impossible by construction (the big
    # batch uses one key); instead pin the randomness by making the loss
    # deterministic: t is sampled per graph, so use the same batch repeated —
    # then grads of accum(k) and big-batch differ only by RNG folding.
    # For an exact check, accumulate the SAME batch 4 times with the SAME rng
    # and compare against a single step on that batch.
    state0 = create_train_state(params, opt)
    one = micro[0]

    import bio_diffusion_tpu.train.step as step_mod

    loss_fn = step_mod.make_loss_fn(evd, dc, dl, nodes_dist.log_prob_table, training=True)
    rng0 = jax.random.fold_in(jax.random.PRNGKey(7), state0.step)

    # manual reference: grad of the mean over 4 identical micro-batches with
    # per-micro rngs == mean of their grads
    grads = []
    infos = []
    for i in range(4):
        (_, info), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, one, jax.random.fold_in(rng0, i))
        grads.append(g)
        infos.append(info)
    mean_grads = jax.tree.map(lambda *gs: sum(gs) / 4.0, *grads)

    new_state, metrics = step_acc(state0, [one, one, one, one], jax.random.PRNGKey(7))

    # the accumulated step must equal an optimizer step applied to mean_grads
    from bio_diffusion_tpu.train.state import adaptive_clip

    clipped, state_c, _, _ = adaptive_clip(state0, mean_grads, enabled=True)
    import optax

    updates, _ = opt.update(clipped, state_c.opt_state, params)
    expected_params = optax.apply_updates(params, updates)

    for (p1, p2) in zip(jax.tree.leaves(new_state.params), jax.tree.leaves(expected_params)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-6, atol=1e-7)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))

    # and a size-16 batch single step runs fine with the non-accum step
    state1, m1 = step_big(state0, big, jax.random.PRNGKey(7))
    assert np.isfinite(float(m1["loss"]))


def test_trainer_grad_accumulation_runs(tmp_path):
    """Trainer end-to-end with accumulate_grad_batches=2: half the optimizer
    steps per epoch, finite loss."""
    from bio_diffusion_tpu.cli.train import main

    workdir = str(tmp_path / "run")
    main(TINY + [
        "trainer.accumulate_grad_batches=2",
        "datamodule.dataloader_cfg.batch_size=4",
        "trainer.early_stopping_monitor=",
        f"--workdir={workdir}",
        "--max-epochs=1",
        "--max-steps=3",
    ])
    with open(os.path.join(workdir, "metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    train_rows = [r for r in rows if r.get("train/loss")]
    assert train_rows
    # each optimizer step consumed 2 loader micro-batches
    assert int(train_rows[-1]["step"]) == 3
    assert np.isfinite(float(train_rows[-1]["train/loss"]))


def test_in_training_sampling_eval_and_viz(tmp_path):
    """In-training sampling evaluation end to end (reference
    sample_and_analyze, qm9_mol_gen_ddpm.py:745): one epoch with
    sample_during_training, eval_epochs=1 and visualization on — stability
    metrics logged under val/, xyz frames + viz artifacts written.  Runs
    under the trainer's default 8-virtual-device mesh, so the mesh-bound
    eval sampler path (Trainer.evaluate_sampling) is the one exercised."""
    from bio_diffusion_tpu.cli.train import main

    workdir = str(tmp_path / "run")
    main([o for o in TINY if "sample_during_training" not in o] + [
        "model.diffusion_cfg.sample_during_training=true",
        "model.diffusion_cfg.eval_epochs=1",
        "model.diffusion_cfg.num_eval_samples=4",
        "model.diffusion_cfg.eval_batch_size=4",
        "model.diffusion_cfg.visualize_sample_epochs=1",
        "model.diffusion_cfg.visualize_chain_epochs=0",
        "model.diffusion_cfg.num_visualization_samples=1",
        "datamodule.dataloader_cfg.batch_size=4",
        "trainer.early_stopping_monitor=",
        f"--workdir={workdir}",
        "--max-epochs=1",
        "--max-steps=2",
    ])
    with open(os.path.join(workdir, "metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    stab = [r for r in rows if r.get("val/mol_stable")]
    assert stab, "sampling-eval metrics not logged"
    assert 0.0 <= float(stab[-1]["val/mol_stable"]) <= 1.0
    media = os.path.join(workdir, "media", "epoch_0")
    assert os.path.isdir(media) and os.listdir(media), "no viz artifacts"


def test_early_stopping_patience(tmp_path):
    """lr=0 => the monitored val loss never improves => stop after patience
    checks (reference EarlyStopping semantics)."""
    from bio_diffusion_tpu.cli.train import main

    workdir = str(tmp_path / "run")
    main(TINY + [
        "model.optimizer.lr=0.0",
        "trainer.min_epochs=0",
        "trainer.check_val_every_n_epoch=1",
        "trainer.early_stopping_monitor=val/loss",
        "trainer.early_stopping_patience=2",
        f"--workdir={workdir}",
        "--max-epochs=50",
    ])
    with open(os.path.join(workdir, "metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    epochs = [int(r["epoch"]) for r in rows if r.get("epoch") not in (None, "")]
    # first val sets best; two non-improving checks then stop => ~3-4 epochs
    assert max(epochs) <= 5, f"early stopping did not trigger (ran {max(epochs)+1} epochs)"


def test_cli_mesh_parity(tmp_path):
    """CLI-built 8-device mesh training matches single-device numerics."""
    from bio_diffusion_tpu.cli.train import main

    assert len(jax.devices()) == 8  # conftest forces 8 virtual CPU devices

    losses = {}
    for name, flag in [("mesh", "trainer.use_mesh=true"),
                       ("single", "trainer.use_mesh=false")]:
        workdir = str(tmp_path / name)
        main(TINY + [
            flag,
            "trainer.early_stopping_monitor=",
            f"--workdir={workdir}",
            "--max-epochs=1",
        ])
        with open(os.path.join(workdir, "metrics.csv")) as f:
            rows = list(csv.DictReader(f))
        losses[name] = [float(r["train/loss"]) for r in rows if r.get("train/loss")]

    assert losses["mesh"] and losses["single"]
    np.testing.assert_allclose(losses["mesh"], losses["single"], rtol=1e-5)


def test_cli_mesh_with_model_shards(tmp_path):
    """num_model_shards=2 (FSDP-ish) trains through the CLI."""
    from bio_diffusion_tpu.cli.train import main

    workdir = str(tmp_path / "run")
    main(TINY + [
        "trainer.use_mesh=true",
        "trainer.num_model_shards=2",
        "trainer.early_stopping_monitor=",
        f"--workdir={workdir}",
        "--max-epochs=1",
    ])
    with open(os.path.join(workdir, "metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    train_rows = [r for r in rows if r.get("train/loss")]
    assert train_rows and np.isfinite(float(train_rows[-1]["train/loss"]))
