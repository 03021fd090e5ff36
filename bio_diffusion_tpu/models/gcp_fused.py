"""Fused edge-message GCP2: split-weight evaluation of the first message layer.

The first message-fusion GCP2 consumes concat(node_i, edge, node_j) features
per edge.  Materializing that concat costs O(E * (2S + Se)) memory traffic
and the scalar matmul O(E * (2S + Se) * S_out) FLOPs, with E = N^2 edges —
but the node contributions are rank-deficient across edges: ``W @ [s_i; e;
s_j]`` splits into per-NODE matmuls ``W_i @ s_i`` / ``W_j @ s_j`` (computed
once per node, broadcast over edges) plus a small per-edge part.  This drops
the dominant cost ~20x for QM9 shapes while computing identical math.

Parameter names/shapes are IDENTICAL to the plain GCP2 (one fused kernel per
Linear), so checkpoints are interchangeable and using this module is purely
an execution-strategy choice.

Only the configuration the trained models use is supported (GCP2, frame
updates on, vector_gate or norm-gate, no vector residual);
GCPMessagePassing falls back to the reference-shaped GCP2 otherwise.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bio_diffusion_tpu.models.nn import Linear, _uniform_init, get_nonlinearity
from bio_diffusion_tpu.ops.geometry import safe_norm, scalarize
from bio_diffusion_tpu.ops.scalar_vector import ScalarVector

Array = jnp.ndarray


class SplitLinear(nn.Module):
    """A Linear over a (virtual) concatenated input, evaluated per part.

    Parts may have different leading ranks; each part's contribution is
    computed with a slice of the shared kernel and broadcast-added.  The
    parameter tree ({kernel [sum(split_dims), features], bias}) matches a
    plain Linear applied to the materialized concat.
    """

    features: int
    split_dims: Tuple[int, ...]
    use_bias: bool = True

    @nn.compact
    def __call__(self, parts: Sequence[Array]) -> Array:
        in_features = sum(self.split_dims)
        bound = 1.0 / math.sqrt(in_features)
        kernel = self.param("kernel", _uniform_init(bound), (in_features, self.features))
        out = None
        off = 0
        for p, d in zip(parts, self.split_dims):
            k = jax.lax.slice_in_dim(kernel, off, off + d, axis=0)
            y = jnp.einsum("...i,io->...o", p, k.astype(p.dtype))
            out = y if out is None else out + y
            off += d
        if self.use_bias:
            bias = self.param("bias", _uniform_init(bound), (self.features,))
            out = out + bias.astype(out.dtype)
        return out


class _ScalarOutSplit(nn.Module):
    """Split-input scalar_out head with the same param paths as _ScalarOut."""

    features: int
    split_dims: Tuple[int, ...]
    feedforward_out: bool
    nonlinearity: Optional[str] = "silu"

    @nn.compact
    def __call__(self, parts: Sequence[Array]) -> Array:
        if not self.feedforward_out:
            return SplitLinear(self.features, self.split_dims, name="scalar_out")(parts)
        act = get_nonlinearity(self.nonlinearity)
        h = SplitLinear(self.features, self.split_dims, name="scalar_out_0")(parts)
        return Linear(self.features, name="scalar_out_2")(act(h))


class GCP2FusedEdgeMessage(nn.Module):
    """GCP2 over per-edge concat(node_i, edge, node_j) without materializing it.

    Equivalent math to GCP2(input=(2S+Se, 2V+Ve) -> output) called on the
    concatenated edge rep (reference GCPMessagePassing.message,
    gcpnet.py:676-713); see module docstring.
    """

    node_dims: Tuple[int, int]  # (S, V) of node rep
    edge_dims: Tuple[int, int]  # (Se, Ve) of edge rep
    output_dims: Tuple[int, int]
    nonlinearities: Tuple[Optional[str], Optional[str]] = ("silu", "silu")
    scalar_out_nonlinearity: Optional[str] = "silu"
    vector_gate: bool = True
    feedforward_out: bool = False
    bottleneck: int = 1
    sv_output_dim: int = 3
    nonlinearity_slope: float = 1e-2

    @property
    def vector_input_dim(self) -> int:
        return 2 * self.node_dims[1] + self.edge_dims[1]

    @property
    def hidden_dim(self) -> int:
        v_in = self.vector_input_dim
        _, v_out = self.output_dims
        return v_in // self.bottleneck if self.bottleneck > 1 else max(v_in, v_out)

    @nn.compact
    def __call__(
        self,
        node_rep: ScalarVector,  # s [B,N,S], v [B,N,V,3]
        edge_rep: ScalarVector,  # e [B,N,N,Se], xi [B,N,N,Ve,3]
        frames: Array,  # [B,N,N,3,3]
    ) -> ScalarVector:
        s_dim, v_dim = self.node_dims
        se_dim, ve_dim = self.edge_dims
        s_out, v_out = self.output_dims
        scalar_act = get_nonlinearity(self.nonlinearities[0], self.nonlinearity_slope)
        vector_act = get_nonlinearity(self.nonlinearities[1], self.nonlinearity_slope)

        s, v = node_rep
        e, xi = edge_rep
        v_pre_node = jnp.swapaxes(v, -1, -2)  # [B,N,3,V]
        xi_pre = jnp.swapaxes(xi, -1, -2)  # [B,N,N,3,Ve]

        # virtual concat over the channel axis: [v_i | xi | v_j]
        v_parts = [v_pre_node[:, :, None], xi_pre, v_pre_node[:, None, :]]
        vh = SplitLinear(
            self.hidden_dim, (v_dim, ve_dim, v_dim), use_bias=False, name="vector_down"
        )(v_parts)  # [B,N,N,3,H]
        vector_norm = safe_norm(vh, axis=-2)  # [B,N,N,H]

        vdf = SplitLinear(
            self.sv_output_dim, (v_dim, ve_dim, v_dim), use_bias=False, name="vector_down_frames"
        )(v_parts)  # [B,N,N,3,3]
        scalar_hidden = scalarize(jnp.swapaxes(vdf, -1, -2), frames)  # [B,N,N,9]

        # virtual concat [s_i | e | s_j | vnorm | scalar_hidden]
        split = (s_dim, se_dim, s_dim, self.hidden_dim, self.sv_output_dim * 3)
        parts = [s[:, :, None], e, s[:, None, :], vector_norm, scalar_hidden]
        scalar_out_val = _ScalarOutSplit(
            s_out, split, self.feedforward_out, self.scalar_out_nonlinearity,
            name="scalar_out_head",
        )(parts)

        # vector update (vector_gate default; norm-gate fallback)
        vector_rep = Linear(v_out, use_bias=False, name="vector_up")(vh)  # [B,N,N,3,v_out]
        vector_rep = jnp.swapaxes(vector_rep, -1, -2)
        if self.vector_gate:
            gate = Linear(v_out, name="vector_out_scale")(vector_act(scalar_out_val))
            vector_rep = vector_rep * nn.sigmoid(gate)[..., None]
        else:
            vector_rep = vector_rep * vector_act(safe_norm(vector_rep, axis=-1, keepdims=True))

        return ScalarVector(scalar_act(scalar_out_val), vector_rep)
