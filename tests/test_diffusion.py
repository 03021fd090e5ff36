"""Diffusion-core correctness: oracle-denoiser sampling, schedules, loss terms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from bio_diffusion_tpu.config.schema import DataloaderConfig, DiffusionConfig
from bio_diffusion_tpu.models.diffusion import (
    EquivariantVariationalDiffusion,
    GammaNetwork,
)
from bio_diffusion_tpu.ops.geometry import centralize


class OracleDynamics(nn.Module):
    """Perfect eps-predictor for a fixed clean sample xh0 (normalized scale).

    eps_hat(z, t) = (z - alpha_t * xh0) / sigma_t — with this denoiser, the
    ancestral sampler must reconstruct xh0 almost exactly, pinning the
    reverse-step algebra (mu/sigma posterior, final decode).
    """

    xh0: jnp.ndarray
    gamma_table: jnp.ndarray
    T: int

    @nn.compact
    def __call__(self, z, t, node_mask, context=None, xh_self_cond=None, deterministic=True):
        # NOTE: concrete numpy init — param creation must not emit traced ops
        # when a model is first initialized through a lax.scan sampling path
        _ = self.param("dummy", lambda k, s: np.zeros(s, np.float32), (1,))
        t_int = jnp.clip(jnp.round(t * self.T).astype(jnp.int32), 0, self.T)
        gamma_t = self.gamma_table[t_int]  # [B,1]
        alpha_t = jnp.sqrt(jax.nn.sigmoid(-gamma_t))[..., None]
        sigma_t = jnp.sqrt(jax.nn.sigmoid(gamma_t))[..., None]
        eps = (z - alpha_t * self.xh0) / sigma_t
        # CoM-project the position part like the real network does
        nx = 3
        _, eps_x = centralize(eps[..., :nx], node_mask)
        return jnp.concatenate([eps_x, eps[..., nx:]], axis=-1) * node_mask[..., None]


def test_oracle_sampler_reconstructs_data(key):
    from bio_diffusion_tpu.ops.schedules import predefined_gamma_table

    B, N, K = 16, 9, 5
    T = 100
    dc = DiffusionConfig(num_timesteps=T)
    dl = DataloaderConfig()
    rng = np.random.default_rng(0)

    mask = jnp.ones((B, N), jnp.float32)
    x0 = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    _, x0 = centralize(x0, mask)
    types = rng.integers(0, K, (B, N))
    oh0 = jax.nn.one_hot(jnp.asarray(types), K)
    ch0 = jnp.asarray(rng.integers(1, 9, (B, N, 1)).astype(np.float32))

    # normalized clean sample (norm_values = (1, 4, 10))
    xh0_norm = jnp.concatenate([x0, oh0 / 4.0, ch0 / 10.0], axis=-1)

    table = jnp.asarray(predefined_gamma_table("polynomial_2", T, 1e-5), jnp.float32)
    oracle = OracleDynamics(xh0=xh0_norm, gamma_table=table, T=T)
    evd = EquivariantVariationalDiffusion(dynamics=oracle, diffusion_cfg=dc, dataloader_cfg=dl)

    params = evd.init(key, key, mask, method=evd.mol_gen_sample)
    xh, _ = evd.apply(params, jax.random.PRNGKey(7), mask, method=evd.mol_gen_sample)
    xh = np.asarray(xh)

    # positions recovered to within the t=0 noise floor (sigma_0 ~ 3e-3)
    assert np.abs(xh[..., :3] - np.asarray(x0)).max() < 0.05
    # atom types recovered exactly
    assert (xh[..., 3:8].argmax(-1) == types).all()
    # charges recovered exactly (rounded)
    assert np.array_equal(xh[..., 8], np.asarray(ch0)[..., 0])


def test_segmented_sampler_matches_oracle(key):
    """The chunked host-driven sampler must also reconstruct oracle data."""
    from bio_diffusion_tpu.ops.schedules import predefined_gamma_table
    from bio_diffusion_tpu.train.sampling import SegmentedSampler

    B, N, K = 8, 7, 5
    T = 60
    dc = DiffusionConfig(num_timesteps=T)
    dl = DataloaderConfig()
    rng = np.random.default_rng(3)
    mask = jnp.ones((B, N), jnp.float32)
    x0 = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    _, x0 = centralize(x0, mask)
    types = rng.integers(0, K, (B, N))
    oh0 = jax.nn.one_hot(jnp.asarray(types), K)
    ch0 = jnp.asarray(rng.integers(1, 9, (B, N, 1)).astype(np.float32))
    xh0_norm = jnp.concatenate([x0, oh0 / 4.0, ch0 / 10.0], axis=-1)

    table = jnp.asarray(predefined_gamma_table("polynomial_2", T, 1e-5), jnp.float32)
    oracle = OracleDynamics(xh0=xh0_norm, gamma_table=table, T=T)
    evd = EquivariantVariationalDiffusion(dynamics=oracle, diffusion_cfg=dc, dataloader_cfg=dl)
    params = evd.init(key, key, mask, method=evd.mol_gen_sample)

    sampler = SegmentedSampler(evd, params, segment_size=25)  # uneven: 25+25+10
    xh = sampler.run(jax.random.PRNGKey(5), mask)
    assert np.abs(xh[..., :3] - np.asarray(x0)).max() < 0.05
    assert (xh[..., 3:8].argmax(-1) == types).all()


def test_noising_statistics(key):
    """z_t = alpha x + sigma eps with CoM-free x-noise and masked h-noise."""
    dc = DiffusionConfig(num_timesteps=10)
    dl = DataloaderConfig()
    from bio_diffusion_tpu.models.gcpnet import GCPNetDynamics
    from bio_diffusion_tpu.config.schema import ModelConfig, ModuleConfig, LayerConfig

    net = GCPNetDynamics(ModelConfig(h_hidden_dim=8, chi_hidden_dim=2, e_hidden_dim=4,
                                     xi_hidden_dim=1, num_encoder_layers=1),
                         ModuleConfig(), LayerConfig(), dc, dl, remat_interactions=False)
    evd = EquivariantVariationalDiffusion(dynamics=net, diffusion_cfg=dc, dataloader_cfg=dl)

    B, N = 4, 6
    mask = jnp.asarray(np.concatenate([np.ones((B, 4)), np.zeros((B, 2))], 1), jnp.float32)
    xh = jax.random.normal(key, (B, N, 9)) * mask[..., None]

    def run(module, rng):
        gamma_t = module.gamma(jnp.full((B, 1), 0.5))
        return module.compute_noised_representation(xh, mask, gamma_t, rng)

    params = evd.init(key, xh[..., :3], xh[..., 3:8], xh[..., 8:], mask, key, training=True)
    z_t, eps = evd.apply(params, key, method=run)
    z_t, eps = np.asarray(z_t), np.asarray(eps)
    m = np.asarray(mask)
    # masked rows zero
    assert np.abs(z_t * (1 - m)[..., None]).max() == 0
    # eps x-part CoM-free per molecule
    assert np.abs(eps[..., :3].sum(1)).max() < 1e-5


def test_gamma_network_monotone_and_endpoints(key):
    gn = GammaNetwork()
    t = jnp.linspace(0, 1, 50)[:, None]
    params = gn.init(key, t)
    g = np.asarray(gn.apply(params, t))[:, 0]
    assert np.all(np.diff(g) > -1e-6), "learned gamma must be monotone"
    assert np.isclose(g[0], -5.0, atol=1e-4)
    assert np.isclose(g[-1], 10.0, atol=1e-4)


def test_repaint_schedule_golden():
    """Golden RePaint schedules computed by hand from the reference algorithm."""
    evd = EquivariantVariationalDiffusion
    assert evd.get_repaint_schedule(1, 1, 5) == [5]
    # resamplings=2, jump=1, T=3 (worked example; see diffusion.py)
    assert evd.get_repaint_schedule(2, 1, 3) == [2, 2, 1]
    s_vals, jumps = evd.repaint_step_arrays([2, 2, 1], 1)
    assert list(s_vals) == [2, 1, 1, 0, 0]
    assert list(jumps) == [False, True, False, True, False]
    # schedule always starts at T-1 and ends at 0
    for (r, j, T) in [(3, 2, 10), (2, 5, 20), (1, 10, 50)]:
        sched = evd.get_repaint_schedule(r, j, T)
        sv, jf = evd.repaint_step_arrays(sched, j)
        assert sv[0] == T - 1 and sv[-1] == 0


def test_vlb_vs_l2_loss_assembly():
    from bio_diffusion_tpu.models.diffusion import assemble_nll

    B = 3
    terms = {
        "delta_log_px": jnp.zeros(B),
        "error_t": jnp.ones(B) * 10.0,
        "SNR_weight": jnp.ones(B) * 2.0,
        "loss_0_x": jnp.ones(B),
        "loss_0_h": jnp.ones(B),
        "neg_log_constants": jnp.ones(B) * 0.5,
        "kl_prior": jnp.ones(B) * 0.1,
        "t_int": jnp.ones(B),
        "num_nodes": jnp.full(B, 5.0),
        "eps_hat_x": jnp.float32(0.0),
        "eps_hat_h": jnp.float32(0.0),
    }
    # l2 training: loss_t = 0.5 * error / ((3+6)*n); loss_0_x also normalized
    nll, _ = assemble_nll(terms, "l2", True, 100, 3, 6, log_pN=jnp.zeros(B))
    denom = 9 * 5.0
    expected = 0.5 * 10 / denom + (1 / denom + 1) + 0.1
    assert np.allclose(np.asarray(nll), expected, rtol=1e-6)
    # vlb/eval: loss_t = T * 0.5 * SNR_weight * error; loss_0 includes constants
    nll2, _ = assemble_nll(terms, "l2", False, 100, 3, 6, log_pN=jnp.zeros(B))
    expected2 = 100 * 0.5 * 2 * 10 + (1 + 1 + 0.5) + 0.1
    assert np.allclose(np.asarray(nll2), expected2, rtol=1e-6)
