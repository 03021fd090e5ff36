"""GVP-style protein graph featurization (feature-function library).

Counterpart of the reference's ProteinGraphDataset + helper
(src/datamodules/components/protein_graph_dataset.py, helper.py): dihedrals,
chain orientations, sidechain directions, RBF distance embeddings,
positional embeddings, and masked kNN graphs — jnp-native with static
shapes (masked top-k instead of torch_cluster.knn_graph).  In this repo the
molecule pipeline reuses ``orientations`` (ops/geometry.py); the rest
scaffolds pocket-conditional generation (GCDM-SBDD lineage).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from bio_diffusion_tpu.ops.geometry import safe_normalize

Array = jnp.ndarray


def rbf(d: Array, d_min: float = 0.0, d_max: float = 20.0, d_count: int = 16) -> Array:
    """Radial basis embedding of distances along a new trailing axis
    (reference helper.py:_rbf)."""
    mu = jnp.linspace(d_min, d_max, d_count)
    sigma = (d_max - d_min) / d_count
    return jnp.exp(-(((d[..., None] - mu) / sigma) ** 2))


def dihedrals(x: Array, eps: float = 1e-7) -> Array:
    """Backbone dihedral features [n_residues, 6] = (cos, sin) of phi/psi/omega.

    ``x``: [n_residues, 3(N,CA,C), 3] backbone coords (reference
    ProteinGraphDataset._dihedrals).
    """
    flat = x.reshape(-1, 3)  # [3n, 3]
    dx = flat[1:] - flat[:-1]
    u = safe_normalize(dx)
    u2, u1, u0 = u[:-2], u[1:-1], u[2:]
    n2 = safe_normalize(jnp.cross(u2, u1))
    n1 = safe_normalize(jnp.cross(u1, u0))
    cos_d = jnp.clip(jnp.sum(n2 * n1, axis=-1), -1 + eps, 1 - eps)
    d = jnp.sign(jnp.sum(u2 * n1, axis=-1)) * jnp.arccos(cos_d)
    d = jnp.pad(d, (1, 2))
    d = d.reshape(-1, 3)  # [n, 3] phi, psi, omega
    return jnp.concatenate([jnp.cos(d), jnp.sin(d)], axis=-1)


def sidechains(x: Array) -> Array:
    """Imputed C-beta directions [n_residues, 3] from N/CA/C (reference
    ProteinGraphDataset._sidechains)."""
    n, origin, c = x[:, 0], x[:, 1], x[:, 2]
    c = safe_normalize(c - origin)
    n = safe_normalize(n - origin)
    bisector = safe_normalize(c + n)
    perp = safe_normalize(jnp.cross(c, n))
    return -bisector * math.sqrt(1 / 3) - perp * math.sqrt(2 / 3)


def positional_embeddings(offsets: Array, num_embeddings: int = 16) -> Array:
    """Sinusoidal embeddings of (signed) sequence offsets per edge."""
    freq = jnp.exp(
        jnp.arange(0, num_embeddings, 2, dtype=jnp.float32)
        * -(math.log(10000.0) / num_embeddings)
    )
    angles = offsets[..., None] * freq
    return jnp.concatenate([jnp.cos(angles), jnp.sin(angles)], axis=-1)


def masked_knn_graph(
    x: Array,  # [N, 3]
    node_mask: Array,  # [N]
    k: int,
    include_self: bool = False,
) -> Tuple[Array, Array]:
    """Static-shape kNN graph: for each node, its k nearest valid neighbors.

    TPU-native replacement for torch_cluster.knn_graph: returns
    (neighbor_idx [N, k] int32, neighbor_mask [N, k]).  Invalid slots point
    at 0 with mask 0.
    """
    n = x.shape[0]
    diff = x[:, None, :] - x[None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    valid = (node_mask[None, :] > 0) & (node_mask[:, None] > 0)
    if not include_self:
        valid = valid & (~jnp.eye(n, dtype=bool))
    big = jnp.asarray(1e9, d2.dtype)
    d2 = jnp.where(valid, d2, big)
    neg_top, idx = jax.lax.top_k(-d2, k)  # nearest = largest negative distance
    nbr_mask = (-neg_top) < big / 2
    return idx.astype(jnp.int32), nbr_mask.astype(x.dtype)


def masked_radius_graph(
    x: Array,
    node_mask: Array,
    radius: float,
    max_neighbors: int,
) -> Tuple[Array, Array]:
    """Static-shape radius graph: up to ``max_neighbors`` within ``radius``."""
    idx, nbr_mask = masked_knn_graph(x, node_mask, max_neighbors)
    d = jnp.linalg.norm(x[:, None, :] - x[idx], axis=-1)
    within = (d <= radius).astype(x.dtype)
    return idx, nbr_mask * within
