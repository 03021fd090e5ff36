"""The fused Pallas GCP2-chain kernel must match the XLA GCP2 modules exactly
(same params, interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from bio_diffusion_tpu.models.gcp import GCP2
from bio_diffusion_tpu.models.nn import Linear
from bio_diffusion_tpu.ops.pallas.gcp_kernel import fused_gcp2_chain
from bio_diffusion_tpu.ops.scalar_vector import ScalarVector


def _stack_weights(params_list, attn_params):
    def leaf(p, *path):
        node = p["params"]
        for k in path:
            node = node[k]
        return np.asarray(node)

    wd = jnp.stack([leaf(p, "vector_down", "kernel") for p in params_list])
    wdf = jnp.stack([leaf(p, "vector_down_frames", "kernel") for p in params_list])
    ws = jnp.stack([leaf(p, "scalar_out_head", "scalar_out", "kernel") for p in params_list])
    bs = jnp.stack([leaf(p, "scalar_out_head", "scalar_out", "bias") for p in params_list])
    wu = jnp.stack([leaf(p, "vector_up", "kernel") for p in params_list])
    wg = jnp.stack([leaf(p, "vector_out_scale", "kernel") for p in params_list])
    bg = jnp.stack([leaf(p, "vector_out_scale", "bias") for p in params_list])
    wattn = jnp.asarray(attn_params["params"]["kernel"])
    battn = jnp.asarray(attn_params["params"]["bias"])
    return wd, wdf, ws, bs, wu, wg, bg, wattn, battn


def test_fused_chain_matches_xla(key):
    S, V = 32, 4
    E = 70  # deliberately not a multiple of the block size
    rng = np.random.default_rng(0)

    s = jnp.asarray(rng.normal(size=(E, S)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(E, V, 3)).astype(np.float32))
    frames = jnp.asarray(rng.normal(size=(E, 3, 3)).astype(np.float32))

    gcp = GCP2(input_dims=(S, V), output_dims=(S, V), vector_gate=True, bottleneck=4)
    keys = jax.random.split(key, 4)
    params_list = [gcp.init(k, ScalarVector(s, v), frames) for k in keys[:3]]
    attn = Linear(1)
    attn_params = attn.init(keys[3], s)

    # XLA reference: residual chain + sigmoid scalar attention
    rep = ScalarVector(s, v)
    for p in params_list:
        rep = rep + gcp.apply(p, rep, frames)
    attn_val = jax.nn.sigmoid(attn.apply(attn_params, rep.scalar))
    expected_s = rep.scalar * attn_val
    expected_v = rep.vector

    # kernel layouts
    v_cm = jnp.swapaxes(v, -1, -2).reshape(E, 3 * V)
    f_flat = jnp.swapaxes(frames, -1, -2).reshape(E, 9)  # coordinate-major
    weights = _stack_weights(params_list, attn_params)
    s_out, v_out = fused_gcp2_chain(s, v_cm, f_flat, *weights, block=64, interpret=True)

    v_out_std = jnp.swapaxes(v_out.reshape(E, 3, V), -1, -2)
    assert np.allclose(np.asarray(s_out), np.asarray(expected_s), atol=2e-5), (
        np.abs(np.asarray(s_out) - np.asarray(expected_s)).max()
    )
    assert np.allclose(np.asarray(v_out_std), np.asarray(expected_v), atol=2e-5)
