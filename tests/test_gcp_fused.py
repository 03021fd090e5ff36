"""GCP2FusedEdgeMessage must compute identical math to GCP2-on-concat with
the SAME parameter tree (the fused module is an execution strategy, not a
different model)."""

import jax
import jax.numpy as jnp
import numpy as np

from bio_diffusion_tpu.models.gcp import GCP2
from bio_diffusion_tpu.models.gcp_fused import GCP2FusedEdgeMessage
from bio_diffusion_tpu.ops.geometry import build_edge_mask, centralize, localize
from bio_diffusion_tpu.ops.scalar_vector import ScalarVector


def test_fused_equals_naive_gcp2(key):
    B, N = 2, 5
    S, V = 16, 3
    Se, Ve = 8, 2
    out_dims = (12, 4)
    rng = np.random.default_rng(0)

    mask = jnp.ones((B, N), jnp.float32)
    x = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32))
    _, x = centralize(x, mask)
    em = build_edge_mask(mask)
    frames = localize(x, em)

    node = ScalarVector(
        jnp.asarray(rng.normal(size=(B, N, S)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(B, N, V, 3)).astype(np.float32)),
    )
    edge = ScalarVector(
        jnp.asarray(rng.normal(size=(B, N, N, Se)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(B, N, N, Ve, 3)).astype(np.float32)),
    )

    fused = GCP2FusedEdgeMessage(
        node_dims=(S, V), edge_dims=(Se, Ve), output_dims=out_dims,
        vector_gate=True, bottleneck=4,
    )
    params = fused.init(key, node, edge, frames)
    out_fused = fused.apply(params, node, edge, frames)

    # materialized concat path through the reference-shaped GCP2
    s_i = jnp.broadcast_to(node.scalar[:, :, None], (B, N, N, S))
    s_j = jnp.broadcast_to(node.scalar[:, None, :], (B, N, N, S))
    v_i = jnp.broadcast_to(node.vector[:, :, None], (B, N, N, V, 3))
    v_j = jnp.broadcast_to(node.vector[:, None, :], (B, N, N, V, 3))
    message = ScalarVector(
        jnp.concatenate([s_i, edge.scalar, s_j], axis=-1),
        jnp.concatenate([v_i, edge.vector, v_j], axis=-2),
    )
    naive = GCP2(
        input_dims=(2 * S + Se, 2 * V + Ve), output_dims=out_dims,
        vector_gate=True, bottleneck=4,
    )
    out_naive = naive.apply(params, message, frames)

    assert np.allclose(np.asarray(out_fused.scalar), np.asarray(out_naive.scalar), atol=1e-5)
    assert np.allclose(np.asarray(out_fused.vector), np.asarray(out_naive.vector), atol=1e-5)


def test_fused_init_shapes_match_naive(key):
    """Param trees must be exactly interchangeable."""
    B, N, S, V, Se, Ve = 1, 4, 8, 3, 4, 2
    node = ScalarVector(jnp.zeros((B, N, S)), jnp.zeros((B, N, V, 3)))
    edge = ScalarVector(jnp.zeros((B, N, N, Se)), jnp.zeros((B, N, N, Ve, 3)))
    frames = jnp.zeros((B, N, N, 3, 3))
    fused = GCP2FusedEdgeMessage(node_dims=(S, V), edge_dims=(Se, Ve), output_dims=(8, 2),
                                 bottleneck=4)
    p_fused = fused.init(key, node, edge, frames)

    msg = ScalarVector(jnp.zeros((B, N, N, 2 * S + Se)), jnp.zeros((B, N, N, 2 * V + Ve, 3)))
    naive = GCP2(input_dims=(2 * S + Se, 2 * V + Ve), output_dims=(8, 2), bottleneck=4)
    p_naive = naive.init(key, msg, frames)

    flat_f = jax.tree_util.tree_flatten_with_path(p_fused)[0]
    flat_n = jax.tree_util.tree_flatten_with_path(p_naive)[0]
    paths_f = {jax.tree_util.keystr(k): v.shape for k, v in flat_f}
    paths_n = {jax.tree_util.keystr(k): v.shape for k, v in flat_n}
    assert paths_f == paths_n
