"""EGNN property classifier (evaluation-only) + its torch checkpoint loader.

Behavioral counterpart of the reference's standalone EGNN regressor used to
score conditional generation (src/__init__.py:233-419: E_GCL / E_GCL_mask /
EGNN, plus get_classifier loading args.pickle + best_checkpoint.npy).  The
classifier predicts a normalized property value per molecule; conditional
eval reports MAE between predictions on generated molecules and the
conditioning values.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from bio_diffusion_tpu.models.nn import Linear
from bio_diffusion_tpu.ops.geometry import masked_sum

Array = jnp.ndarray


class EGCLMask(nn.Module):
    """Masked E_GCL layer without coordinate updates (reference :343-372)."""

    hidden_nf: int
    nodes_attr_dim: int = 0
    attention: bool = False

    @nn.compact
    def __call__(
        self,
        h: Array,  # [B, N, H]
        x: Array,  # [B, N, 3]
        edge_mask: Array,  # [B, N, N] (self-loops excluded)
        node_attr: Optional[Array] = None,
    ) -> Array:
        b, n = h.shape[:2]
        diff = x[:, :, None, :] - x[:, None, :, :]
        radial = jnp.sum(diff * diff, axis=-1, keepdims=True)

        h_i = jnp.broadcast_to(h[:, :, None], (b, n, n, h.shape[-1]))
        h_j = jnp.broadcast_to(h[:, None, :], (b, n, n, h.shape[-1]))
        e_in = jnp.concatenate([h_i, h_j, radial], axis=-1)
        m = jax.nn.silu(Linear(self.hidden_nf, name="edge_mlp_0")(e_in))
        m = jax.nn.silu(Linear(self.hidden_nf, name="edge_mlp_2")(m))
        if self.attention:
            att = jax.nn.sigmoid(Linear(1, name="att_mlp_0")(m))
            m = m * att
        m = m * edge_mask[..., None].astype(m.dtype)

        agg = jnp.sum(m, axis=-2)  # already edge-masked
        parts = [h, agg] + ([node_attr] if node_attr is not None else [])
        nh = jax.nn.silu(Linear(self.hidden_nf, name="node_mlp_0")(jnp.concatenate(parts, -1)))
        out = Linear(self.hidden_nf, name="node_mlp_2")(nh)
        return h + out  # recurrent


class EGNNClassifier(nn.Module):
    """Per-graph property regressor (reference EGNN, :378-419)."""

    in_node_nf: int = 5
    hidden_nf: int = 128
    n_layers: int = 7
    attention: bool = True
    node_attr: int = 0

    @nn.compact
    def __call__(self, h0: Array, x: Array, node_mask: Array) -> Array:
        """h0 [B,N,K] one-hot, x [B,N,3], node_mask [B,N] -> pred [B]."""
        m = node_mask.astype(h0.dtype)
        em = m[:, :, None] * m[:, None, :]
        n = h0.shape[1]
        em = em * (1.0 - jnp.eye(n, dtype=em.dtype))

        h = Linear(self.hidden_nf, name="embedding")(h0)
        for i in range(self.n_layers):
            h = EGCLMask(
                self.hidden_nf,
                nodes_attr_dim=self.in_node_nf if self.node_attr else 0,
                attention=self.attention,
                name=f"gcl_{i}",
            )(h, x, em, node_attr=h0 if self.node_attr else None)

        h = jax.nn.silu(Linear(self.hidden_nf, name="node_dec_0")(h))
        h = Linear(self.hidden_nf, name="node_dec_2")(h)
        h = h * m[..., None]
        g = jnp.sum(h, axis=1)  # [B, H]
        g = jax.nn.silu(Linear(self.hidden_nf, name="graph_dec_0")(g))
        pred = Linear(1, name="graph_dec_2")(g)
        return pred[..., 0]


_CLASSIFIER_SEQ_IDX = {"edge_mlp", "node_mlp", "att_mlp", "node_dec", "graph_dec"}


def _map_classifier_key(name: str):
    """torch state_dict key -> flax path ('gcl_0.edge_mlp.0.weight' style)."""
    parts = name.split(".")
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in _CLASSIFIER_SEQ_IDX and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(f"{p}_{parts[i + 1]}")
            i += 2
        else:
            out.append(p)
            i += 1
    return out


def load_torch_classifier(model_dir: str) -> Tuple[EGNNClassifier, Dict[str, Any]]:
    """Load the reference classifier directory (args.pickle +
    best_checkpoint.npy) into an EGNNClassifier + params."""
    import torch

    with open(os.path.join(model_dir, "args.pickle"), "rb") as f:
        args = pickle.load(f)
    model = EGNNClassifier(
        in_node_nf=5,
        hidden_nf=int(args.nf),
        n_layers=int(args.n_layers),
        attention=bool(args.attention),
        node_attr=int(args.node_attr),
    )
    state_dict = torch.load(
        os.path.join(model_dir, "best_checkpoint.npy"), map_location="cpu", weights_only=False
    )

    flat = {}
    for name, tensor in state_dict.items():
        path = _map_classifier_key(name)
        arr = np.asarray(tensor.detach().cpu().numpy())
        if path[-1] == "weight" and arr.ndim == 2:
            path = path[:-1] + ["kernel"]
            arr = arr.T
        flat["/".join(path)] = arr

    from bio_diffusion_tpu.train.torch_import import unflatten

    params = {"params": unflatten(flat)}
    return model, params
