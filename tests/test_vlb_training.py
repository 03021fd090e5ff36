"""VLB objective + learned gamma schedule training path."""

import jax
import jax.numpy as jnp
import numpy as np

from bio_diffusion_tpu.config.schema import (
    DataloaderConfig, DiffusionConfig, LayerConfig, ModelConfig, ModuleConfig, OptimizerConfig,
)
from bio_diffusion_tpu.data.batch import iterate_dense_batches
from bio_diffusion_tpu.data.synthetic import synthetic_qm9_like
from bio_diffusion_tpu.models.diffusion import EquivariantVariationalDiffusion
from bio_diffusion_tpu.models.distributions import NumNodesDistribution
from bio_diffusion_tpu.models.gcpnet import GCPNetDynamics
from bio_diffusion_tpu.train.state import create_train_state, make_optimizer
from bio_diffusion_tpu.train.step import make_train_step


def test_vlb_learned_gamma_trains(key):
    dc = DiffusionConfig(num_timesteps=10, loss_type="vlb", noise_schedule="learned")
    dl = DataloaderConfig()
    net = GCPNetDynamics(
        ModelConfig(h_hidden_dim=8, chi_hidden_dim=2, e_hidden_dim=4, xi_hidden_dim=1,
                    num_encoder_layers=1),
        ModuleConfig(), LayerConfig(), dc, dl, remat_interactions=False,
    )
    evd = EquivariantVariationalDiffusion(dynamics=net, diffusion_cfg=dc, dataloader_cfg=dl)

    ds = synthetic_qm9_like(num_molecules=32, max_nodes=10, seed=0)
    rng = np.random.default_rng(0)
    batch = next(iterate_dense_batches(ds, batch_size=8, rng=rng, pad_to=10))
    params = evd.init(key, jnp.asarray(batch.x), jnp.asarray(batch.one_hot),
                      jnp.asarray(batch.charges), jnp.asarray(batch.node_mask), key,
                      training=True)
    # the learned GammaNetwork parameters exist
    assert "gamma" in params["params"]
    assert "l2" in params["params"]["gamma"]

    hist = {int(n): int(c) for n, c in zip(*np.unique(ds.data["num_atoms"], return_counts=True))}
    nodes_dist = NumNodesDistribution(hist)
    opt = make_optimizer(OptimizerConfig(lr=1e-3))
    state = create_train_state(params, opt)
    step_fn = make_train_step(evd, opt, dc, dl, nodes_dist.log_prob_table, donate=False)

    losses = []
    for i in range(5):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(1))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # gamma endpoints moved (learned schedule receives gradients)
    g0_new = np.asarray(state.params["params"]["gamma"]["gamma_0"])
    assert not np.allclose(g0_new, -5.0) or not np.allclose(
        np.asarray(state.params["params"]["gamma"]["gamma_1"]), 10.0
    )
