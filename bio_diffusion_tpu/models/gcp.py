"""GCP / GCP2: the scalar<->vector geometry-complete perceptron modules.

Behavioral counterparts of the reference's GCP (gcpnet.py:35-262) and GCP2
(gcpnet.py:265-491, the configured default), re-designed for dense tensors:

  * A module instance operates on ANY leading dims — ``[B, N, ...]`` node
    reps or ``[B, N, N, ...]`` edge reps — because the reference's only
    node/edge asymmetry (scatter-mean of frame projections over out-edges
    for node inputs) is folded into the ``frames`` argument: callers pass
    per-node MEAN frames for node inputs and raw per-edge frames for edge
    inputs (see ops/geometry.py:node_mean_frames).  Every frame op is then a
    local 3x3 contraction; no scatters exist anywhere in the module.
  * Parameter names mirror the reference state_dict leaf names
    (vector_down, scalar_out, vector_up, vector_out_scale,
    vector_down_frames, scalar_out_frames, ...) so checkpoint import is a
    name-keyed transpose.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from bio_diffusion_tpu.models.nn import Linear, get_nonlinearity, is_identity
from bio_diffusion_tpu.ops.geometry import safe_norm, scalarize, vectorize
from bio_diffusion_tpu.ops.scalar_vector import ScalarVector

Array = jnp.ndarray
Rep = Union[ScalarVector, Array]


class _ScalarOut(nn.Module):
    """scalar_out head: single Linear, or Linear-act-Linear when feedforward_out."""

    features: int
    feedforward_out: bool
    nonlinearity: Optional[str] = "silu"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if not self.feedforward_out:
            return Linear(self.features, name="scalar_out")(x)
        act = get_nonlinearity(self.nonlinearity)
        h = Linear(self.features, name="scalar_out_0")(x)
        return Linear(self.features, name="scalar_out_2")(act(h))


class GCP2(nn.Module):
    """Geometry-complete perceptron, v2 (frame scalarization pre-scalar-MLP).

    Reference: gcpnet.py:265-491.  Default QM9/GEOM configuration uses
    ``vector_gate=True, frame_gate=False`` (row-wise sigmoid vector gating;
    frames only feed the scalar path).
    """

    input_dims: Tuple[int, int]
    output_dims: Tuple[int, int]
    nonlinearities: Tuple[Optional[str], Optional[str]] = ("silu", "silu")
    scalar_out_nonlinearity: Optional[str] = "silu"
    scalar_gate: int = 0  # config parity; creates no parameters (unused in reference forward)
    vector_gate: bool = True
    frame_gate: bool = False
    sigma_frame_gate: bool = False  # unused by GCP2 (GCP1-only flag)
    feedforward_out: bool = False
    bottleneck: int = 1
    vector_residual: bool = False
    vector_frame_residual: bool = False  # unused by GCP2
    ablate_frame_updates: bool = False
    ablate_scalars: bool = False
    ablate_vectors: bool = False
    sv_output_dim: int = 3  # scalarization_vectorization_output_dim
    nonlinearity_slope: float = 1e-2

    @property
    def hidden_dim(self) -> int:
        s_in, v_in = self.input_dims
        _, v_out = self.output_dims
        return v_in // self.bottleneck if self.bottleneck > 1 else max(v_in, v_out)

    @nn.compact
    def __call__(self, rep: Rep, frames: Array) -> Rep:
        s_in, v_in = self.input_dims
        s_out, v_out = self.output_dims
        scalar_act = get_nonlinearity(self.nonlinearities[0], self.nonlinearity_slope)
        vector_act = get_nonlinearity(self.nonlinearities[1], self.nonlinearity_slope)

        v_pre = None
        vector_hidden = None
        if v_in:
            scalar_rep, vector_rep = rep  # [..., S], [..., V, 3]
            if self.ablate_scalars:
                scalar_rep = jnp.zeros_like(scalar_rep)
            if self.ablate_vectors:
                vector_rep = jnp.zeros_like(vector_rep)
            v_pre = jnp.swapaxes(vector_rep, -1, -2)  # [..., 3, V]
            vector_hidden = Linear(self.hidden_dim, use_bias=False, name="vector_down")(v_pre)
            vector_norm = safe_norm(vector_hidden, axis=-2)  # [..., H]
            merged = jnp.concatenate([scalar_rep, vector_norm], axis=-1)
            if not self.ablate_frame_updates:
                # curate direction-robust scalar geometric features
                vdf = Linear(self.sv_output_dim, use_bias=False, name="vector_down_frames")(v_pre)
                scalar_hidden = scalarize(jnp.swapaxes(vdf, -1, -2), frames)  # [..., 3*sv]
                merged = jnp.concatenate([merged, scalar_hidden], axis=-1)
        else:
            merged = rep.scalar if isinstance(rep, ScalarVector) else rep
            if self.ablate_scalars:
                merged = jnp.zeros_like(merged)

        scalar_out_val = _ScalarOut(
            s_out, self.feedforward_out, self.scalar_out_nonlinearity, name="scalar_out_head"
        )(merged)

        if not v_out:
            if self.ablate_scalars:
                scalar_out_val = jnp.zeros_like(scalar_out_val)
            return scalar_act(scalar_out_val)

        if v_out and not v_in:
            vector_out = jnp.zeros(scalar_out_val.shape[:-1] + (v_out, 3), dtype=scalar_out_val.dtype)
        else:
            vector_out = self._process_vector(
                scalar_out_val, v_pre, vector_hidden, frames, vector_act
            )

        scalar_final = scalar_act(scalar_out_val)
        if self.ablate_scalars:
            scalar_final = jnp.zeros_like(scalar_final)
        if self.ablate_vectors:
            vector_out = jnp.zeros_like(vector_out)
        return ScalarVector(scalar_final, vector_out)

    def _process_vector(self, scalar_rep, v_pre, vector_hidden, frames, vector_act) -> Array:
        _, v_out = self.output_dims
        vector_rep = Linear(v_out, use_bias=False, name="vector_up")(vector_hidden)  # [..., 3, v_out]
        if self.vector_residual:
            vector_rep = vector_rep + v_pre
        vector_rep = jnp.swapaxes(vector_rep, -1, -2)  # [..., v_out, 3]

        if not self.ablate_frame_updates and self.frame_gate:
            gate = Linear(self.sv_output_dim * 3, name="vector_out_scale_frames")(vector_act(scalar_rep))
            gate_vector = vectorize(gate, frames)  # [..., sv, 3]
            gv = Linear(v_out, use_bias=False, name="vector_up_frames")(jnp.swapaxes(gate_vector, -1, -2))
            gate_vector_rep = jnp.swapaxes(gv, -1, -2)  # [..., v_out, 3]
            vector_rep = vector_rep * vector_act(safe_norm(gate_vector_rep, axis=-1, keepdims=True))
        elif self.vector_gate:
            gate = Linear(v_out, name="vector_out_scale")(vector_act(scalar_rep))
            vector_rep = vector_rep * nn.sigmoid(gate)[..., None]
        elif not is_identity(self.nonlinearities[1]):
            vector_rep = vector_rep * vector_act(safe_norm(vector_rep, axis=-1, keepdims=True))
        return vector_rep


class GCP(nn.Module):
    """Geometry-complete perceptron, v1 (frame scalarization post-scalar-MLP).

    Reference: gcpnet.py:35-262.  Kept for config parity
    (module_cfg.selected_GCP may select it); GCP2 is the trained default.
    """

    input_dims: Tuple[int, int]
    output_dims: Tuple[int, int]
    nonlinearities: Tuple[Optional[str], Optional[str]] = ("silu", "silu")
    scalar_out_nonlinearity: Optional[str] = "silu"
    scalar_gate: int = 0
    vector_gate: bool = True
    frame_gate: bool = False
    sigma_frame_gate: bool = False
    feedforward_out: bool = False
    bottleneck: int = 1
    vector_residual: bool = False
    vector_frame_residual: bool = False
    ablate_frame_updates: bool = False
    ablate_scalars: bool = False
    ablate_vectors: bool = False
    sv_output_dim: int = 3
    nonlinearity_slope: float = 1e-2

    @property
    def hidden_dim(self) -> int:
        s_in, v_in = self.input_dims
        _, v_out = self.output_dims
        return v_in // self.bottleneck if self.bottleneck > 1 else max(v_in, v_out)

    @nn.compact
    def __call__(self, rep: Rep, frames: Array) -> Rep:
        s_in, v_in = self.input_dims
        s_out, v_out = self.output_dims
        scalar_act = get_nonlinearity(self.nonlinearities[0], self.nonlinearity_slope)
        vector_act = get_nonlinearity(self.nonlinearities[1], self.nonlinearity_slope)

        v_pre = None
        vector_hidden = None
        if v_in:
            scalar_rep, vector_rep = rep
            if self.ablate_scalars:
                scalar_rep = jnp.zeros_like(scalar_rep)
            if self.ablate_vectors:
                vector_rep = jnp.zeros_like(vector_rep)
            v_pre = jnp.swapaxes(vector_rep, -1, -2)
            vector_hidden = Linear(self.hidden_dim, use_bias=False, name="vector_down")(v_pre)
            vector_norm = safe_norm(vector_hidden, axis=-2)
            merged = jnp.concatenate([scalar_rep, vector_norm], axis=-1)
        else:
            merged = rep.scalar if isinstance(rep, ScalarVector) else rep
            if self.ablate_scalars:
                merged = jnp.zeros_like(merged)

        scalar_rep = _ScalarOut(
            s_out, self.feedforward_out, self.scalar_out_nonlinearity, name="scalar_out_head"
        )(merged)

        vector_rep_out = None
        if v_in and v_out:
            vector_rep_out = self._process_vector(scalar_rep, v_pre, vector_hidden, vector_act)

        scalar_rep = scalar_act(scalar_rep)
        if v_out and not v_in:
            vector_rep_out = jnp.zeros(scalar_rep.shape[:-1] + (v_out, 3), dtype=scalar_rep.dtype)

        if self.ablate_frame_updates:
            if v_out:
                s = jnp.zeros_like(scalar_rep) if self.ablate_scalars else scalar_rep
                vec = jnp.zeros_like(vector_rep_out) if self.ablate_vectors else vector_rep_out
                return ScalarVector(s, vec)
            return jnp.zeros_like(scalar_rep) if self.ablate_scalars else scalar_rep

        # frame-based scalar update
        v_pre2 = jnp.swapaxes(vector_rep_out, -1, -2) if v_out else (
            jnp.swapaxes(
                jnp.zeros(scalar_rep.shape[:-1] + (self.hidden_dim, 3), dtype=scalar_rep.dtype), -1, -2
            )
            if v_in
            else None
        )
        if v_pre2 is None:
            # pure scalar module: reference creates no frame sub-modules in this case
            return scalar_rep
        vector_hidden2 = Linear(self.sv_output_dim, use_bias=False, name="vector_down_frames")(v_pre2)
        scalar_hidden = scalarize(jnp.swapaxes(vector_hidden2, -1, -2), frames)
        merged2 = jnp.concatenate([scalar_rep, scalar_hidden], axis=-1)
        scalar_rep2 = Linear(s_out, name="scalar_out_frames")(merged2)

        if not v_out:
            if self.ablate_scalars:
                scalar_rep2 = jnp.zeros_like(scalar_rep2)
            return scalar_act(scalar_rep2)

        if v_in and v_out:
            vector_rep_out = self._process_vector_frames(scalar_rep2, v_pre2, frames, vector_act)

        scalar_final = scalar_act(scalar_rep2)
        if self.ablate_scalars:
            scalar_final = jnp.zeros_like(scalar_final)
        if self.ablate_vectors:
            vector_rep_out = jnp.zeros_like(vector_rep_out)
        return ScalarVector(scalar_final, vector_rep_out)

    def _process_vector(self, scalar_rep, v_pre, vector_hidden, vector_act) -> Array:
        _, v_out = self.output_dims
        vector_rep = Linear(v_out, use_bias=False, name="vector_up")(vector_hidden)
        if self.vector_residual:
            vector_rep = vector_rep + v_pre
        vector_rep = jnp.swapaxes(vector_rep, -1, -2)
        if self.vector_gate:
            gate = Linear(v_out, name="vector_out_scale")(vector_act(scalar_rep))
            vector_rep = vector_rep * nn.sigmoid(gate)[..., None]
        elif not is_identity(self.nonlinearities[1]):
            vector_rep = vector_rep * vector_act(safe_norm(vector_rep, axis=-1, keepdims=True))
        return vector_rep

    def _process_vector_frames(self, scalar_rep, v_pre2, frames, vector_act) -> Array:
        _, v_out = self.output_dims
        vector_rep = jnp.swapaxes(v_pre2, -1, -2)  # [..., v_out, 3]
        if self.sigma_frame_gate:
            gate = Linear(v_out, name="vector_out_scale_sigma_frames")(vector_act(scalar_rep))
            vector_rep = vector_rep * nn.sigmoid(gate)[..., None]
        elif self.frame_gate:
            gate = Linear(self.sv_output_dim * 3, name="vector_out_scale_frames")(vector_act(scalar_rep))
            gate_vector = vectorize(gate, frames)
            gv = Linear(v_out, use_bias=False, name="vector_up_frames")(jnp.swapaxes(gate_vector, -1, -2))
            gate_vector_rep = jnp.swapaxes(gv, -1, -2)
            vector_rep = vector_rep * vector_act(safe_norm(gate_vector_rep, axis=-1, keepdims=True))
            if self.vector_frame_residual:
                vector_rep = vector_rep + jnp.swapaxes(v_pre2, -1, -2)
        elif not is_identity(self.nonlinearities[1]):
            vector_rep = vector_rep * vector_act(safe_norm(vector_rep, axis=-1, keepdims=True))
        return vector_rep


GCP_CLASSES = {"gcp": GCP, "gcp2": GCP2}


def make_gcp(
    selected_gcp: str,
    input_dims: Tuple[int, int],
    output_dims: Tuple[int, int],
    module_cfg,
    *,
    name: Optional[str] = None,
    nonlinearities: Optional[Tuple[Optional[str], Optional[str]]] = None,
    bottleneck: Optional[int] = None,
    vector_residual: Optional[bool] = None,
    feedforward_out: bool = False,
) -> nn.Module:
    """Instantiate a GCP variant from a ModuleConfig with optional overrides
    (behavioral counterpart of the reference's get_GCP_with_custom_cfg +
    direct selected_GCP instantiations)."""
    cls = GCP_CLASSES[selected_gcp.lower()]
    return cls(
        input_dims=tuple(input_dims),
        output_dims=tuple(output_dims),
        nonlinearities=(
            tuple(nonlinearities) if nonlinearities is not None else module_cfg.nonlinearities
        ),
        scalar_gate=module_cfg.scalar_gate,
        vector_gate=module_cfg.vector_gate,
        frame_gate=module_cfg.frame_gate,
        sigma_frame_gate=module_cfg.sigma_frame_gate,
        feedforward_out=feedforward_out,
        bottleneck=bottleneck if bottleneck is not None else 1,
        vector_residual=(
            vector_residual if vector_residual is not None else module_cfg.vector_residual
        ),
        vector_frame_residual=module_cfg.vector_frame_residual,
        ablate_frame_updates=module_cfg.ablate_frame_updates,
        ablate_scalars=module_cfg.ablate_scalars,
        ablate_vectors=module_cfg.ablate_vectors,
        name=name,
    )
