"""Warm-start partial restore + debug-mode runtime invariant checks.

Covers the reference's strict=False state_dict warm start
(/root/reference/src/train.py:91-106) and its in-forward invariant
assertions (assert_mean_zero_with_mask / assert_correctly_masked,
variational_diffusion.py:442-474), here as checkify checks behind
``diffusion_cfg.debug_invariants``.
"""

import dataclasses
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
from bio_diffusion_tpu.train.checkpoints import (
    merge_partial, save_checkpoint, warm_start_params,
)
from bio_diffusion_tpu.train.state import create_train_state, make_optimizer
from bio_diffusion_tpu.train.step import make_loss_fn, make_train_step


def _build(num_layers=1, debug=False):
    dc = DiffusionConfig(num_timesteps=10, debug_invariants=debug)
    dl = DataloaderConfig()
    net = GCPNetDynamics(
        ModelConfig(h_hidden_dim=16, chi_hidden_dim=4, e_hidden_dim=8, xi_hidden_dim=2,
                    num_encoder_layers=num_layers),
        ModuleConfig(), LayerConfig(), dc, dl, remat_interactions=False,
    )
    evd = EquivariantVariationalDiffusion(dynamics=net, diffusion_cfg=dc, dataloader_cfg=dl)
    return evd, dc, dl


def _data_and_params(evd, seed=0):
    ds = synthetic_qm9_like(num_molecules=8, max_nodes=8, seed=0)
    rng = np.random.default_rng(0)
    batch = next(iterate_dense_batches(ds, batch_size=8, rng=rng, shuffle=False, pad_to=8))
    key = jax.random.PRNGKey(seed)
    from bio_diffusion_tpu.ops.geometry import centralize

    _, x0 = centralize(jnp.asarray(batch.x), jnp.asarray(batch.node_mask))
    params = evd.init(
        key, x0, jnp.asarray(batch.one_hot), jnp.asarray(batch.charges),
        jnp.asarray(batch.node_mask), key, training=True,
    )
    hist = {int(n): int(c) for n, c in zip(*np.unique(ds.data["num_atoms"], return_counts=True))}
    return ds, batch, params, NumNodesDistribution(hist)


def test_merge_partial_intersection():
    tmpl = {"a": jnp.zeros((2, 3)), "b": {"c": jnp.zeros(4), "new": jnp.zeros(5)}}
    raw = {"a": np.ones((2, 3)), "b": {"c": np.full(4, 2.0), "stale": np.ones(7)},
           "gone": np.ones(1)}
    merged, loaded, skipped = merge_partial(tmpl, raw)
    np.testing.assert_array_equal(np.asarray(merged["a"]), 1.0)
    np.testing.assert_array_equal(np.asarray(merged["b"]["c"]), 2.0)
    np.testing.assert_array_equal(np.asarray(merged["b"]["new"]), 0.0)
    assert sorted(loaded) == ["/a", "/b/c"]
    assert "/b/new" in skipped


def test_merge_partial_shape_mismatch_keeps_template():
    tmpl = {"w": jnp.zeros((2, 3))}
    merged, loaded, skipped = merge_partial(tmpl, {"w": np.ones((3, 3))})
    np.testing.assert_array_equal(np.asarray(merged["w"]), 0.0)
    assert not loaded and "/w" in skipped


def test_warm_start_into_larger_model(tmp_path):
    """Train tiny 1-layer model, warm start a 2-layer model from its
    checkpoint: shared leaves load, the extra layer keeps fresh init, and the
    loss is finite (VERDICT r1 item 8)."""
    evd1, dc, dl = _build(num_layers=1)
    ds, batch, params1, nodes_dist = _data_and_params(evd1)
    opt = make_optimizer(OptimizerConfig())
    step = make_train_step(evd1, opt, dc, dl, nodes_dist.log_prob_table, donate=False)
    state = create_train_state(params1, opt)
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, state)

    evd2, dc2, dl2 = _build(num_layers=2)
    _, _, params2, _ = _data_and_params(evd2, seed=5)
    merged, n_loaded, skipped = warm_start_params(ckpt_dir, params2, source="params")
    assert n_loaded > 0
    assert any("interaction_layers_1" in s for s in skipped)

    # shared leaves come from the checkpoint...
    got = merged["params"]["dynamics"]["gcp_embedding"]
    want = jax.tree.map(np.asarray, state.params["params"]["dynamics"]["gcp_embedding"])
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), b, rtol=0, atol=0)
    # ...the extra layer keeps its fresh values
    fresh = params2["params"]["dynamics"]["interaction_layers_1"]
    kept = merged["params"]["dynamics"]["interaction_layers_1"]
    for a, b in zip(jax.tree.leaves(kept), jax.tree.leaves(fresh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)

    # and the warm-started model trains with a finite loss
    loss_fn = make_loss_fn(evd2, dc2, dl2, nodes_dist.log_prob_table, training=True)
    loss, _ = loss_fn(merged, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))


def test_warm_start_ema_source(tmp_path):
    evd1, dc, dl = _build(num_layers=1)
    _, batch, params1, nodes_dist = _data_and_params(evd1)
    opt = make_optimizer(OptimizerConfig())
    state = create_train_state(params1, opt)
    # make EMA distinguishable from params
    state = state.replace(ema_params=jax.tree.map(lambda x: x + 1.0, state.params))
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, state)

    merged, n_loaded, _ = warm_start_params(ckpt_dir, params1, source="ema_params")
    assert n_loaded == len(jax.tree.leaves(params1))
    a = np.asarray(jax.tree.leaves(merged)[0])
    b = np.asarray(jax.tree.leaves(state.ema_params)[0])
    np.testing.assert_allclose(a, b)


def test_cli_warm_start(tmp_path):
    """trainer.warm_start_ckpt through the train CLI: run A trains + saves,
    run B warm starts from A's checkpoint dir and trains."""
    from bio_diffusion_tpu.cli.train import main

    TINY = [
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
        "trainer.early_stopping_monitor=",
    ]
    wd_a = str(tmp_path / "a")
    main(TINY + [f"--workdir={wd_a}", "--max-epochs=1"])
    ckpt = os.path.join(wd_a, "checkpoints")
    assert os.path.isdir(ckpt)

    wd_b = str(tmp_path / "b")
    main(TINY + [
        f"trainer.warm_start_ckpt={ckpt}",
        "trainer.warm_start_source=ema_params",
        f"--workdir={wd_b}", "--max-epochs=1",
    ])
    assert os.path.isfile(os.path.join(wd_b, "metrics.csv"))


# ---------------------------------------------------------------------------
# debug_invariants
# ---------------------------------------------------------------------------


def _corrupt_padding(batch):
    """Write garbage into a padded node row of x."""
    x = np.asarray(batch.x).copy()
    mask = np.asarray(batch.node_mask)
    b, n = mask.shape
    bi, ni = np.argwhere(mask == 0)[0]
    x[bi, ni] = 7.7
    return dataclasses.replace(batch, x=x)


def test_debug_invariants_clean_batch_passes():
    evd, dc, dl = _build(debug=True)
    _, batch, params, nodes_dist = _data_and_params(evd)
    opt = make_optimizer(OptimizerConfig())
    step = make_train_step(evd, opt, dc, dl, nodes_dist.log_prob_table, donate=False)
    state = create_train_state(params, opt)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_debug_invariants_trip_on_corrupted_mask():
    """A nonzero padded row must trip the correctly-masked check
    (VERDICT r1 item 10)."""
    from jax.experimental.checkify import JaxRuntimeError

    evd, dc, dl = _build(debug=True)
    _, batch, params, nodes_dist = _data_and_params(evd)
    opt = make_optimizer(OptimizerConfig())
    step = make_train_step(evd, opt, dc, dl, nodes_dist.log_prob_table, donate=False)
    state = create_train_state(params, opt)
    bad = _corrupt_padding(batch)
    with pytest.raises(JaxRuntimeError, match="masked"):
        step(state, bad, jax.random.PRNGKey(1))


def test_debug_invariants_off_by_default_ignores_corruption():
    """With the flag off (default), no checks compile: the corrupted batch
    runs through (garbage in, garbage out — but no overhead on the hot path)."""
    evd, dc, dl = _build(debug=False)
    _, batch, params, nodes_dist = _data_and_params(evd)
    opt = make_optimizer(OptimizerConfig())
    step = make_train_step(evd, opt, dc, dl, nodes_dist.log_prob_table, donate=False)
    state = create_train_state(params, opt)
    state, metrics = step(state, _corrupt_padding(batch), jax.random.PRNGKey(1))
    assert "loss" in metrics


def test_debug_invariants_eval_step():
    from jax.experimental.checkify import JaxRuntimeError

    from bio_diffusion_tpu.train.step import make_eval_step

    evd, dc, dl = _build(debug=True)
    _, batch, params, nodes_dist = _data_and_params(evd)
    eval_step = make_eval_step(evd, dc, dl, nodes_dist.log_prob_table)
    info = eval_step(params, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(info["loss"]))
    with pytest.raises(JaxRuntimeError, match="masked"):
        eval_step(params, _corrupt_padding(batch), jax.random.PRNGKey(0))
