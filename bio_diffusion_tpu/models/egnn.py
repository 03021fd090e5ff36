"""EGNN ablation denoiser over dense molecule batches.

Behavioral counterpart of the reference's EGNNDynamics + lucidrains-style
EGNN_Sparse network (src/models/components/egnn.py:227-823), selected by
``diffusion_cfg.dynamics_network=egnn``.  Dense rework notes:

  * per-edge ops on ``[B, N, N, .]`` with masked aggregation, like gcpnet.py
  * the reference's per-layer pyg ``LayerNorm(mode='graph')`` computes stats
    over ALL nodes of a graph INCLUDING padded rows (they are present in its
    flat batch); replicated by normalizing over the full padded row
  * fourier features / soft edges / global attention are config-parity
    options of the reference network that its dynamics never enables
    (EGNN_Sparse_Network built with defaults, egnn.py:647-651); the dense
    port implements the default path
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bio_diffusion_tpu.config.schema import (
    DataloaderConfig,
    DiffusionConfig,
    LayerConfig,
    ModelConfig,
    ModuleConfig,
    compute_num_atom_types,
)
from bio_diffusion_tpu.models.nn import Linear
from bio_diffusion_tpu.models.gcpnet import NODE_FEATURE_DIFFUSION_TARGETS
from bio_diffusion_tpu.ops.geometry import build_edge_mask, centralize, edge_features, masked_sum, orientations

Array = jnp.ndarray


class CoorsNorm(nn.Module):
    """SE3-Transformer-style coordinate normalization (reference :42-52)."""

    eps: float = 1e-8
    scale_init: float = 1e-2

    @nn.compact
    def __call__(self, coors: Array) -> Array:
        scale = self.param("scale", lambda k, s: jnp.full(s, self.scale_init), (1,))
        norm = jnp.sqrt(jnp.sum(coors * coors, axis=-1, keepdims=True))
        normed = coors / jnp.maximum(norm, self.eps)
        return normed * scale


class GraphLayerNorm(nn.Module):
    """pyg-style LayerNorm(mode='graph'): stats over all nodes+channels of a
    graph (padded rows included, matching the reference's flat batches)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:  # [B, N, F]
        mean = jnp.mean(x, axis=(-1, -2), keepdims=True)
        var = jnp.mean((x - mean) ** 2, axis=(-1, -2), keepdims=True)
        normed = (x - mean) / jnp.sqrt(var + self.eps)
        weight = self.param("weight", lambda k, s: jnp.ones(s), (self.features,))
        bias = self.param("bias", lambda k, s: jnp.zeros(s), (self.features,))
        return normed * weight + bias


def _xavier_linear(features: int, name: str, use_bias: bool = True):
    """torch xavier_normal_ weight + zero bias (reference EGNN_Sparse.init_)."""
    kernel_init = nn.initializers.xavier_normal()
    return nn.Dense(
        features, use_bias=use_bias, kernel_init=kernel_init,
        bias_init=nn.initializers.zeros, name=name,
    )


class EGNNSparseLayer(nn.Module):
    """One EGNN message-passing layer (reference EGNN_Sparse, :227-404)."""

    feats_dim: int
    edge_attr_dim: int = 0
    m_dim: int = 16
    norm_feats: bool = True
    norm_coors: bool = True
    norm_coors_scale_init: float = 1e-2
    coors_tanh: bool = True
    update_feats: bool = True
    update_coors: bool = True

    @nn.compact
    def __call__(
        self,
        x: Array,  # [B, N, 3]
        feats: Array,  # [B, N, F]
        edge_attr: Array,  # [B, N, N, E]
        edge_mask: Array,  # [B, N, N]
    ) -> Tuple[Array, Array]:
        b, n = feats.shape[:2]
        rel_coors = x[:, :, None, :] - x[:, None, :, :]  # [B,N,N,3]
        rel_dist = jnp.sum(rel_coors**2, axis=-1, keepdims=True)
        edge_in = jnp.concatenate([edge_attr, rel_dist], axis=-1)

        f_i = jnp.broadcast_to(feats[:, :, None], (b, n, n, feats.shape[-1]))
        f_j = jnp.broadcast_to(feats[:, None, :], (b, n, n, feats.shape[-1]))
        m_in = jnp.concatenate([f_i, f_j, edge_in], axis=-1)

        edge_input_dim = 2 * self.feats_dim + self.edge_attr_dim + 1
        h = _xavier_linear(edge_input_dim * 2, "edge_mlp_0")(m_in)
        h = jax.nn.silu(h)
        m_ij = jax.nn.silu(_xavier_linear(self.m_dim, "edge_mlp_3")(h))

        coors_out = x
        if self.update_coors:
            cw = jax.nn.silu(_xavier_linear(self.m_dim * 4, "coors_mlp_0")(m_ij))
            coor_wij = _xavier_linear(1, "coors_mlp_3")(cw)
            if self.coors_tanh:
                coor_wij = jnp.tanh(coor_wij)
            rel = CoorsNorm(scale_init=self.norm_coors_scale_init, name="coors_norm")(rel_coors) if self.norm_coors else rel_coors
            mhat = masked_sum(coor_wij * rel, edge_mask, axis=-2)  # sum over j
            coors_out = x + mhat

        feats_out = feats
        if self.update_feats:
            m_i = masked_sum(m_ij, edge_mask, axis=-2)
            hidden = GraphLayerNorm(self.feats_dim, name="node_norm")(feats) if self.norm_feats else feats
            nh = jax.nn.silu(_xavier_linear(self.feats_dim * 2, "node_mlp_0")(
                jnp.concatenate([hidden, m_i], axis=-1)
            ))
            feats_out = feats + _xavier_linear(self.feats_dim, "node_mlp_3")(nh)

        return coors_out, feats_out


class EGNNDynamics(nn.Module):
    """eps-prediction denoiser with the EGNN backbone (reference :573-823)."""

    model_cfg: ModelConfig
    module_cfg: ModuleConfig
    layer_cfg: LayerConfig
    diffusion_cfg: DiffusionConfig
    dataloader_cfg: DataloaderConfig
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        xh: Array,
        t: Array,
        node_mask: Array,
        context: Optional[Array] = None,
        xh_self_cond: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        mc, mod, dc, dl = self.model_cfg, self.module_cfg, self.diffusion_cfg, self.dataloader_cfg
        nx = dl.num_x_dims
        node_target = dc.diffusion_target in NODE_FEATURE_DIFFUSION_TARGETS
        h_input_dim_ = compute_num_atom_types(dl) + int(dl.include_charges) if node_target else mc.h_input_dim
        h_cond = int(dc.condition_on_time) + len(mod.conditioning)

        mask_f = node_mask.astype(xh.dtype)
        xh = xh * mask_f[..., None]
        x_init = xh[..., :nx]
        h = xh[..., nx:]
        edge_mask = build_edge_mask(node_mask, include_self_loops=True).astype(xh.dtype)
        e_s, _ = edge_features(x_init, edge_mask)

        if dc.self_condition:
            if xh_self_cond is None:
                xh_self_cond = jnp.zeros_like(xh)
            e_s_sc, _ = edge_features(xh_self_cond[..., :nx], edge_mask)
            h = jnp.concatenate([h, xh_self_cond[..., nx:]], axis=-1)
            e_s = jnp.concatenate([e_s, e_s_sc], axis=-1)

        if dc.condition_on_time:
            n = xh.shape[-2]
            h_time = jnp.broadcast_to(t[..., None, :], t.shape[:-1] + (n, 1)).astype(h.dtype)
            h = jnp.concatenate([h, h_time], axis=-1)
        if len(mod.conditioning) > 0:
            assert context is not None
            h = jnp.concatenate([h, context.astype(h.dtype)], axis=-1)

        _, x = centralize(x_init, node_mask)

        cdt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        if cdt is not None:
            h, e_s, x = h.astype(cdt), e_s.astype(cdt), x.astype(cdt)

        h = Linear(mc.h_hidden_dim, name="node_embedding")(h) * mask_f[..., None].astype(h.dtype)
        e = Linear(mc.e_hidden_dim, name="edge_embedding")(e_s)

        for i in range(mc.num_encoder_layers):
            x, h = EGNNSparseLayer(
                feats_dim=mc.h_hidden_dim,
                edge_attr_dim=mc.e_hidden_dim,
                name=f"egnn_mpnn_layers_{i}",
            )(x, h, e, edge_mask)

        x = x.astype(jnp.float32) * mask_f[..., None]
        h = h * mask_f[..., None].astype(h.dtype)
        h = Linear(h_input_dim_ + h_cond, name="scalar_node_projection")(h)
        h = h.astype(jnp.float32) * mask_f[..., None]

        vel = (x - x_init) * mask_f[..., None]
        if len(mod.conditioning) > 0:
            h = h[..., : h.shape[-1] - len(mod.conditioning)]
        if dc.condition_on_time:
            h = h[..., :-1]

        vel_ok = jnp.all(jnp.isfinite(vel))
        vel = jnp.where(vel_ok, vel, jnp.zeros_like(vel))
        _, vel = centralize(vel, node_mask)
        return jnp.concatenate([vel, h], axis=-1)
