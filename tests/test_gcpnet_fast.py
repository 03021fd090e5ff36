"""Parity: the fast inference forward must match the flax module exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bio_diffusion_tpu.config.schema import (
    DataloaderConfig, DiffusionConfig, LayerConfig, ModelConfig, ModuleConfig,
)
from bio_diffusion_tpu.models.gcpnet import GCPNetDynamics
from bio_diffusion_tpu.models.gcpnet_fast import make_fast_dynamics, supports_fast_path
from bio_diffusion_tpu.ops.geometry import centralize


def build(conditioning=(), self_condition=False):
    mc = ModelConfig(h_hidden_dim=16, chi_hidden_dim=4, e_hidden_dim=8, xi_hidden_dim=2,
                     num_encoder_layers=2)
    mod = ModuleConfig(conditioning=tuple(conditioning))
    lc = LayerConfig()
    dc = DiffusionConfig(num_timesteps=10, self_condition=self_condition)
    dl = DataloaderConfig()
    net = GCPNetDynamics(mc, mod, lc, dc, dl, remat_interactions=False)
    return net, (mc, mod, lc, dc, dl)


@pytest.mark.parametrize("conditioning,self_condition", [((), False), (("alpha",), False), ((), True)])
def test_fast_forward_matches_module(key, conditioning, self_condition):
    net, cfgs = build(conditioning, self_condition)
    mc, mod, lc, dc, dl = cfgs
    assert supports_fast_path(mod, lc)

    B, N = 2, 7
    rng = np.random.default_rng(0)
    mask = jnp.asarray(np.stack([np.ones(N), np.concatenate([np.ones(N - 2), np.zeros(2)])]),
                       dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32)) * mask[..., None]
    _, x = centralize(x, mask)
    h = jnp.asarray(rng.normal(size=(B, N, 6)).astype(np.float32)) * mask[..., None]
    xh = jnp.concatenate([x, h], -1)
    t = jnp.full((B, 1), 0.7)
    ctx = jnp.ones((B, N, 1)) * mask[..., None] if conditioning else None
    sc = jnp.asarray(rng.normal(size=xh.shape).astype(np.float32)) * mask[..., None] if self_condition else None

    params = net.init(key, xh, t, mask, context=ctx, xh_self_cond=sc)
    expected = net.apply(params, xh, t, mask, context=ctx, xh_self_cond=sc)

    # fast path, XLA fallback math (no pallas)
    fwd = make_fast_dynamics(mc, mod, lc, dc, dl, {"params": {"dynamics": params["params"]}},
                             compute_dtype=None, use_pallas=False)
    out = fwd(xh, t, mask, context=ctx, xh_self_cond=sc)
    assert np.allclose(np.asarray(out), np.asarray(expected), atol=3e-5), (
        np.abs(np.asarray(out) - np.asarray(expected)).max()
    )

    # fast path with the fused message-layer (mega) pallas kernel, interpreted
    fwd_k = make_fast_dynamics(mc, mod, lc, dc, dl, {"params": {"dynamics": params["params"]}},
                               compute_dtype=None, use_pallas=True, interpret=True)
    out_k = fwd_k(xh, t, mask, context=ctx, xh_self_cond=sc)
    assert np.allclose(np.asarray(out_k), np.asarray(expected), atol=3e-5), (
        np.abs(np.asarray(out_k) - np.asarray(expected)).max()
    )


def test_epack_int8_parity_and_large_molecule_fallback(key, monkeypatch):
    """PALLAS_EPACK_INT8 (interpret mode): on whole-molecule kernel cells
    the quantized path stays within int8 tolerance of the fp fast path; on
    GEOM-scale molecules (sub-molecule tiles) the gate falls back to the
    fp path instead of tripping the kernel's whole-molecule assertion
    (ADVICE r4)."""
    monkeypatch.setenv("PALLAS_EPACK_INT8", "1")
    net, cfgs = build()
    mc, mod, lc, dc, dl = cfgs
    rng = np.random.default_rng(2)

    def run(N):
        mask = jnp.asarray(
            np.stack([np.ones(N), np.concatenate([np.ones(N - 2), np.zeros(2)])]),
            dtype=jnp.float32,
        )
        x = jnp.asarray(rng.normal(size=(2, N, 3)).astype(np.float32)) * mask[..., None]
        _, x = centralize(x, mask)
        h = jnp.asarray(rng.normal(size=(2, N, 6)).astype(np.float32)) * mask[..., None]
        xh = jnp.concatenate([x, h], -1)
        t = jnp.full((2, 1), 0.5)
        params = net.init(key, xh, t, mask)
        expected = net.apply(params, xh, t, mask)
        fwd = make_fast_dynamics(mc, mod, lc, dc, dl, params, compute_dtype=None,
                                 use_pallas=True, interpret=True)
        return np.asarray(fwd(xh, t, mask)), np.asarray(expected)

    # whole-molecule cell (small N): int8 path runs; per-lane symmetric
    # quantization of the packed edge tensor -> loose output tolerance
    out, expected = run(8)
    assert np.isfinite(out).all()
    assert np.abs(out - expected).max() < 0.1, np.abs(out - expected).max()

    # GEOM-scale molecule (56^2 edge rows > WHOLE_MOL_ROWS so
    # select_tile(56) != 56): gate must fall back to the fp path (exact
    # parity), not crash
    out, expected = run(56)
    assert np.allclose(out, expected, atol=3e-5)


def test_fast_forward_large_molecules(key):
    """GEOM-scale molecules exercise the sub-molecule tile + padding path."""
    net, cfgs = build()
    mc, mod, lc, dc, dl = cfgs
    B, N = 2, 44  # n*n > 1200 -> tiled kernel; 44 % 8 != 0 -> padded
    rng = np.random.default_rng(1)
    mask = jnp.asarray(
        np.stack([np.ones(N), np.concatenate([np.ones(N - 5), np.zeros(5)])]),
        dtype=jnp.float32,
    )
    x = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32)) * mask[..., None]
    _, x = centralize(x, mask)
    h = jnp.asarray(rng.normal(size=(B, N, 6)).astype(np.float32)) * mask[..., None]
    xh = jnp.concatenate([x, h], -1)
    t = jnp.full((B, 1), 0.3)
    params = net.init(key, xh, t, mask)
    expected = net.apply(params, xh, t, mask)
    fwd = make_fast_dynamics(mc, mod, lc, dc, dl, params, compute_dtype=None,
                             use_pallas=True, interpret=True)
    out = fwd(xh, t, mask)
    assert np.allclose(np.asarray(out), np.asarray(expected), atol=3e-5)
