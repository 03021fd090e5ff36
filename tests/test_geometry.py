"""Property tests for the dense geometry ops (L1 layer).

Includes golden comparisons against independent numpy implementations of the
reference formulas (flat edge-list semantics) to pin the dense rework to the
reference behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from bio_diffusion_tpu.ops import geometry as G


def random_batch(rng, B=3, N=8):
    mask = np.zeros((B, N), dtype=np.float32)
    sizes = rng.integers(3, N + 1, size=B)
    for b, n in enumerate(sizes):
        mask[b, :n] = 1.0
    x = rng.normal(size=(B, N, 3)).astype(np.float32) * mask[..., None]
    return jnp.asarray(x), jnp.asarray(mask), sizes


def test_centralize_zero_com_and_mask(rng):
    x, mask, sizes = random_batch(rng)
    centroid, centered = G.centralize(x, mask)
    # per-graph masked mean of centered coords is 0
    com = np.asarray(jnp.sum(centered * mask[..., None], axis=1))
    assert np.abs(com).max() < 1e-5
    # padded rows remain exactly 0
    assert np.abs(np.asarray(centered) * (1 - np.asarray(mask))[..., None]).max() == 0.0
    # decentralize inverts
    restored = G.decentralize(centered, mask, centroid)
    assert np.allclose(np.asarray(restored), np.asarray(x), atol=1e-6)


def test_localize_matches_reference_formula(rng):
    """Golden test: dense frames equal the reference's flat edge-list math."""
    x, mask, sizes = random_batch(rng, B=2, N=6)
    _, xc = G.centralize(x, mask)
    em = G.build_edge_mask(mask, include_self_loops=True)
    f = np.asarray(G.localize(xc, em))
    xc_np = np.asarray(xc)

    for b in range(2):
        n = sizes[b]
        for i in range(6):
            for j in range(6):
                if i < n and j < n and i != j:
                    d = xc_np[b, i] - xc_np[b, j]
                    d = d / (np.linalg.norm(d) + 1)
                    c = np.cross(xc_np[b, i], xc_np[b, j])
                    c = c / (np.linalg.norm(c) + 1)
                    v = np.cross(d, c)
                    expected = np.stack([d, c, v])
                    assert np.allclose(f[b, i, j], expected, atol=1e-5), (b, i, j)
                elif i == j and i < n:
                    assert np.abs(f[b, i, j]).max() < 1e-6  # self-loop frame is 0
                else:
                    assert np.abs(f[b, i, j]).max() == 0.0  # masked edge


def test_localize_rotation_equivariance(rng):
    x, mask, _ = random_batch(rng)
    _, xc = G.centralize(x, mask)
    em = G.build_edge_mask(mask)
    R = jnp.asarray(Rotation.random(random_state=1).as_matrix(), dtype=jnp.float32)
    f = G.localize(xc, em)
    f_rot = G.localize(xc @ R.T, em)
    # each frame axis rotates with R
    assert np.allclose(np.asarray(f_rot), np.asarray(f @ R.T), atol=1e-5)


def test_scalarize_invariance_and_golden(rng):
    """scalarize of node vectors with mean frames == reference scatter-mean."""
    x, mask, sizes = random_batch(rng, B=2, N=5)
    _, xc = G.centralize(x, mask)
    em = G.build_edge_mask(mask)
    f = G.localize(xc, em)
    fnode = G.node_mean_frames(f, em)
    v = jnp.asarray(rng.normal(size=(2, 5, 3, 3)).astype(np.float32))

    out = np.asarray(G.scalarize(v, fnode))  # [B, N, 9]

    # independent reference computation: per-edge frames @ v_i, scatter-mean over source
    f_np, v_np, em_np = np.asarray(f), np.asarray(v), np.asarray(em)
    for b in range(2):
        for i in range(5):
            acc = np.zeros((3, 3))
            cnt = 0
            for j in range(5):
                if em_np[b, i, j]:
                    acc += (f_np[b, i, j] @ v_np[b, i].T).T  # [C, A]
                    cnt += 1
            expected = (acc / cnt).reshape(9) if cnt else np.zeros(9)
            assert np.allclose(out[b, i], expected, atol=1e-5), (b, i)

    # rotation invariance of the scalarization
    R = jnp.asarray(Rotation.random(random_state=2).as_matrix(), dtype=jnp.float32)
    f_r = G.localize(xc @ R.T, em)
    out_rot = np.asarray(G.scalarize(v @ R.T, G.node_mean_frames(f_r, em)))
    assert np.allclose(out_rot, out, atol=1e-4)


def test_vectorize_inverse_consistency(rng):
    x, mask, _ = random_batch(rng, B=2, N=5)
    _, xc = G.centralize(x, mask)
    em = G.build_edge_mask(mask)
    f = G.localize(xc, em)
    gate = jnp.asarray(rng.normal(size=(2, 5, 5, 9)).astype(np.float32))
    vec = np.asarray(G.vectorize(gate, f))
    # golden: per edge, channel c = sum_a gate[3c+a] * axis_a
    f_np, g_np = np.asarray(f), np.asarray(gate)
    b, i, j = 1, 0, 2
    for c in range(3):
        expected = sum(g_np[b, i, j, 3 * c + a] * f_np[b, i, j, a] for a in range(3))
        assert np.allclose(vec[b, i, j, c], expected, atol=1e-5)

    # rotation equivariance
    R = jnp.asarray(Rotation.random(random_state=3).as_matrix(), dtype=jnp.float32)
    f_r = G.localize(xc @ R.T, em)
    vec_rot = np.asarray(G.vectorize(gate, f_r))
    assert np.allclose(vec_rot, vec @ np.asarray(R).T, atol=1e-5)


def test_safe_norm_matches_reference_semantics():
    x = jnp.array([[3.0, 4.0]])
    out = G.safe_norm(x, axis=-1)
    assert np.allclose(np.asarray(out), np.sqrt(25 + 1e-8) + 1e-8)
    # non-sqrt branch
    out2 = G.safe_norm(x, axis=-1, sqrt=False)
    assert np.allclose(np.asarray(out2), 25 + 1e-8)


def test_safe_norm_zero_gradient_is_finite():
    g = jax.grad(lambda v: G.safe_norm(v).sum())(jnp.zeros((4, 3)))
    assert np.isfinite(np.asarray(g)).all()


def test_orientations_shapes_and_normalization(rng):
    x, mask, sizes = random_batch(rng, B=2, N=6)
    chi = np.asarray(G.orientations(jnp.asarray(x), jnp.asarray(mask)))
    assert chi.shape == (2, 6, 2, 3)
    x_np = np.asarray(x)
    b, n = 0, sizes[0]
    # interior nodes: forward = normalize(x[i+1]-x[i])
    for i in range(n - 1):
        d = x_np[b, i + 1] - x_np[b, i]
        assert np.allclose(chi[b, i, 0], d / np.linalg.norm(d), atol=1e-5)
    # boundary: forward at last real node = normalize(0 - x) (zero-pad convention)
    d = -x_np[b, n - 1]
    assert np.allclose(chi[b, n - 1, 0], d / np.linalg.norm(d), atol=1e-5)


def test_edge_features_golden(rng):
    x, mask, sizes = random_batch(rng, B=2, N=5)
    em = G.build_edge_mask(mask)
    es, ev = G.edge_features(x, em)
    x_np = np.asarray(x)
    b, i, j = 0, 1, 3
    d = x_np[b, i] - x_np[b, j]
    assert np.allclose(np.asarray(es)[b, i, j, 0], (d**2).sum(), atol=1e-5)
    assert np.allclose(np.asarray(ev)[b, i, j, 0], d / np.linalg.norm(d), atol=1e-5)
    # self-loop features are zero
    assert np.abs(np.asarray(es)[:, 2, 2]).max() == 0.0
    assert np.abs(np.asarray(ev)[:, 2, 2]).max() == 0.0


def test_masked_mean_empty_groups():
    x = jnp.ones((2, 3, 4))
    mask = jnp.zeros((2, 3))
    out = G.masked_mean(x, mask, axis=1)
    assert np.abs(np.asarray(out)).max() == 0.0
