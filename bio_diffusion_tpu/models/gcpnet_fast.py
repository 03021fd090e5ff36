"""Fast forward for GCPNetDynamics: pure functions + Pallas kernels.

The flax module path (models/gcpnet.py) is the source of truth.  This module
implements an equivalent forward that

  * reads the SAME parameter tree (no conversion),
  * keeps vector features coords-major end to end (no [V,3]<->[3,V]
    transposes on edge tensors),
  * dispatches the per-edge message work to the fused Pallas mega-kernel
    (ops/pallas/gcp_kernel.py) on TPU,

in two flavors:

  * :func:`make_fast_dynamics` — INFERENCE: bakes the weights into the jit as
    constants (kernel packing done once on the host).  Used by the
    SegmentedSampler.
  * :class:`FastGCPNetDynamics` — TRAINING: a flax module that *adopts* the
    module path's parameter tree (pytree-valued params with the same names),
    packs kernel weights with differentiable jnp ops, and runs the Pallas
    mega-kernel forward under a custom VJP whose backward is the jnp
    packed-layout reference math (:func:`message_layer_reference`) — the
    flash-attention pattern: kernel forward, recompute-based analytic
    backward, no giant residuals.

Supported configuration (asserted): GCP2, vector_gate, frame updates on, no
ablations, no gcp-norm/dropout, single feedforward layer, squeeze position
update — exactly the trained QM9/GEOM configuration.  Anything else falls
back to the module path (SegmentedSampler / Trainer handle the choice).

Parity is pinned by tests/test_gcpnet_fast.py (module vs fast forward on
the same params) and tests/test_fast_train.py (gradient parity).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from bio_diffusion_tpu.config.schema import (
    DataloaderConfig, DiffusionConfig, LayerConfig, ModelConfig, ModuleConfig,
    compute_num_atom_types,
)
from bio_diffusion_tpu.models.gcpnet import NODE_FEATURE_DIFFUSION_TARGETS
from bio_diffusion_tpu.ops.geometry import (
    build_edge_mask, centralize, edge_features, localize, node_mean_frames, orientations,
)
from bio_diffusion_tpu.ops.pallas.gcp_kernel import (
    fused_gcp2_chain, fused_message_layer, pack_chain_weights, pack_gcp1_weights,
)

Array = jnp.ndarray


def supports_fast_path(module_cfg: ModuleConfig, layer_cfg: LayerConfig) -> bool:
    return (
        module_cfg.selected_gcp.lower() == "gcp2"
        and module_cfg.vector_gate
        and not module_cfg.frame_gate
        and not module_cfg.ablate_frame_updates
        and not module_cfg.ablate_scalars
        and not module_cfg.ablate_vectors
        and not module_cfg.update_positions_with_vector_sum
        and not layer_cfg.use_gcp_norm
        and not layer_cfg.use_gcp_dropout
        and not layer_cfg.pre_norm
        and layer_cfg.use_scalar_message_attention
        and layer_cfg.num_feedforward_layers == 1
        and layer_cfg.mp_cfg.use_residual_message_gcp
        and module_cfg.scalar_nonlinearity == "silu"
        and module_cfg.vector_nonlinearity == "silu"
        # the fast forward implements no inner-GCP vector residual; a model
        # trained with these on must take the module path to keep its math
        and not module_cfg.vector_residual
        and not module_cfg.default_vector_residual
    )


def _safe_norm_last(x2_sum: Array, eps: float = 1e-8) -> Array:
    return jnp.sqrt(x2_sum + eps) + eps


def _gcp2_apply_cm(w: Dict[str, Any], s: Array, v_cm: Optional[Array], frames: Array,
                   scalar_act: bool, gate_act: Optional[str] = "silu",
                   feedforward_out: bool = False) -> Tuple[Array, Optional[Array]]:
    """Generic GCP2 (vector_gate config) from a flax weight subtree.

    ``v_cm``: [..., 3, V] coords-major vectors (or None for scalar input).
    ``frames``: [..., 3, 3].  Returns (scalar, vectors coords-major or None).
    ``scalar_act``: apply silu to the scalar output (nonlinearities[0]).
    ``gate_act``: the vector nonlinearity applied to the scalar before the
    sigmoid vector gate ("silu" for cfg nonlinearities, None for (None, None)).
    """
    dt = s.dtype
    merged_parts = [s]
    vh = None
    if v_cm is not None and "vector_down" in w:
        wd = w["vector_down"]["kernel"].astype(dt)
        vh = v_cm @ wd  # [..., 3, H]
        vnorm = _safe_norm_last(jnp.sum(vh * vh, axis=-2))
        merged_parts.append(vnorm.astype(dt))
        wdf = w["vector_down_frames"]["kernel"].astype(dt)
        vdf = v_cm @ wdf  # [..., 3, 3] (coords, sv-channels)
        # scalarize: out[..., c*3+a] = sum_k frames[a,k] vdf[k,c]
        sc = jnp.einsum("...ak,...kc->...ca", frames.astype(dt), vdf)
        merged_parts.append(sc.reshape(sc.shape[:-2] + (9,)))

    merged = jnp.concatenate(merged_parts, axis=-1)
    head = w["scalar_out_head"]
    if feedforward_out:
        h0 = merged @ head["scalar_out_0"]["kernel"].astype(dt) + head["scalar_out_0"]["bias"].astype(dt)
        s2 = jax.nn.silu(h0) @ head["scalar_out_2"]["kernel"].astype(dt) + head["scalar_out_2"]["bias"].astype(dt)
    else:
        s2 = merged @ head["scalar_out"]["kernel"].astype(dt) + head["scalar_out"]["bias"].astype(dt)

    v_out = None
    if "vector_up" in w:
        vu = vh @ w["vector_up"]["kernel"].astype(dt)  # [..., 3, V_out]
        gate_in = jax.nn.silu(s2) if gate_act == "silu" else s2
        gate = jax.nn.sigmoid(
            gate_in @ w["vector_out_scale"]["kernel"].astype(dt)
            + w["vector_out_scale"]["bias"].astype(dt)
        )
        v_out = vu * gate[..., None, :]
    s_out = jax.nn.silu(s2) if scalar_act else s2
    return s_out, v_out


def _bd3(m: Array) -> Array:
    """[a, b] -> [3a, 3b] block diagonal (differentiable; kron with eye)."""
    return jnp.kron(jnp.eye(3, dtype=m.dtype), m)


def _bd3_batched(m: Array) -> Array:
    """[G, a, b] -> [G, 3a, 3b] block diagonal."""
    g, a, b = m.shape
    eye = jnp.eye(3, dtype=m.dtype)
    return jnp.einsum("kl,gij->gkilj", eye, m).reshape(g, 3 * a, 3 * b)


def _rep3_jnp(dtype):
    """[3, 9] repeat selector rep3[c, c*3+a] = 1 — folded into packed vdf
    weights so the kernels' scalarize is elementwise (no selector matmuls)."""
    col = jnp.arange(9)[None, :]
    row = jnp.arange(3)[:, None]
    return (col // 3 == row).astype(dtype)


def _gcp2_edge_wide(w: Dict[str, Any], s_e: Array, v_cm: Array, frames_t_flat: Array,
                    gate_act: Optional[str] = "silu") -> Tuple[Array, Array]:
    """Edge-input GCP2 evaluated on WIDE flat tensors only.

    Avoids materializing narrow-minor-dim intermediates ([E, 3, H], [E, 9]
    as 5D/4D tensors) that tile-pad in HBM: vectors stay flattened
    coords-major [E, 3V]; per-coordinate projections become block-diagonal
    matmuls; the scalarize uses the same repeat/tile selector construction
    as the Pallas kernels.

    Args: s_e [B,N,N,Se], v_cm [B,N,N,3,Ve], frames_t_flat [E, 9]
    (coordinate-major k*3+a).  Returns (s_out [B,N,N,S], v_out [B,N,N,3,V]).
    """
    dt = s_e.dtype
    b, n = s_e.shape[0], s_e.shape[1]
    e_cnt = b * n * n
    ve = v_cm.shape[-1]
    s_flat = s_e.reshape(e_cnt, s_e.shape[-1])
    v_flat = v_cm.reshape(e_cnt, 3 * ve)

    wd = w["vector_down"]["kernel"].astype(dt)  # [Ve, H]
    h = wd.shape[1]
    wdf = w["vector_down_frames"]["kernel"].astype(dt)  # [Ve, 3]
    w_comb = jnp.concatenate([_bd3(wd), _bd3(wdf)], axis=1)  # [3Ve, 3H+9]
    vhd = v_flat @ w_comb  # [E, 3H+9]
    vh_sq = sum(vhd[:, k * h:(k + 1) * h] ** 2 for k in range(3))
    vnorm = _safe_norm_last(vh_sq)

    # scalarize via selector matmuls: schid[:, c*3+a] = sum_k vdf_k[:, c] * f[a, k]
    col = jnp.arange(9)[None, :]
    row = jnp.arange(3)[:, None]
    rep3 = (col // 3 == row).astype(dt)
    tile3 = (col % 3 == row).astype(dt)
    h3 = 3 * h
    schid = sum(
        (vhd[:, h3 + 3 * k: h3 + 3 * (k + 1)] @ rep3)
        * (frames_t_flat[:, 3 * k: 3 * (k + 1)].astype(dt) @ tile3)
        for k in range(3)
    )

    head = w["scalar_out_head"]
    ws = head["scalar_out"]["kernel"].astype(dt)
    se_dim = s_flat.shape[-1]
    s2 = (
        s_flat @ ws[:se_dim]
        + vnorm.astype(dt) @ ws[se_dim: se_dim + h]
        + schid @ ws[se_dim + h:]
        + head["scalar_out"]["bias"].astype(dt)
    )

    wu_bd = _bd3(w["vector_up"]["kernel"].astype(dt))  # [3H, 3Vout]
    v_out_flat = vhd[:, :h3] @ wu_bd  # [E, 3Vout]
    v_out_dim = w["vector_up"]["kernel"].shape[1]
    gate_in = jax.nn.silu(s2) if gate_act == "silu" else s2
    gate = jax.nn.sigmoid(
        gate_in @ w["vector_out_scale"]["kernel"].astype(dt)
        + w["vector_out_scale"]["bias"].astype(dt)
    )
    v_out_flat = v_out_flat * jnp.concatenate([gate, gate, gate], axis=-1)

    s_out = jax.nn.silu(s2).reshape(b, n, n, -1)
    v_out = v_out_flat.reshape(b, n, n, 3, v_out_dim)
    return s_out, v_out


def _stack_chain_weights(mp: Dict[str, Any], num_message_layers: int, dtype):
    names = [f"message_fusion_{i}" for i in range(1, num_message_layers)]
    def get(name, *path):
        node = mp[name]
        for p in path:
            node = node[p]
        return node.astype(dtype)

    wd = jnp.stack([get(n, "vector_down", "kernel") for n in names])
    wdf = jnp.stack([get(n, "vector_down_frames", "kernel") for n in names])
    ws = jnp.stack([get(n, "scalar_out_head", "scalar_out", "kernel") for n in names])
    bs = jnp.stack([get(n, "scalar_out_head", "scalar_out", "bias") for n in names])
    wu = jnp.stack([get(n, "vector_up", "kernel") for n in names])
    wg = jnp.stack([get(n, "vector_out_scale", "kernel") for n in names])
    bg = jnp.stack([get(n, "vector_out_scale", "bias") for n in names])
    wattn = mp["scalar_message_attention"]["kernel"].astype(dtype)
    battn = mp["scalar_message_attention"]["bias"].astype(dtype)
    return wd, wdf, ws, bs, wu, wg, bg, wattn, battn


def pack_gcp1_weights_jnp(w1: Dict[str, Any], s_dim: int, v_dim: int, ve_dim: int,
                          dtype) -> Dict[str, Array]:
    """Differentiable (jnp) version of pack_gcp1_weights: split +
    block-diagonalize the first message GCP's weights for the mega-kernel.
    Gradients flow through kron/concat/slice back to the flax tree."""
    wd = w1["vector_down"]["kernel"].astype(dtype)      # [2V+Ve, H]
    wdf = w1["vector_down_frames"]["kernel"].astype(dtype)  # [2V+Ve, 3]
    ws = w1["scalar_out_head"]["scalar_out"]["kernel"].astype(dtype)
    bs = w1["scalar_out_head"]["scalar_out"]["bias"].astype(dtype)
    wu = w1["vector_up"]["kernel"].astype(dtype)        # [H, Vout]
    wg = w1["vector_out_scale"]["kernel"].astype(dtype)
    bg = w1["vector_out_scale"]["bias"].astype(dtype)

    h = wd.shape[1]
    wd_i, wd_e, wd_j = wd[:v_dim], wd[v_dim:v_dim + ve_dim], wd[v_dim + ve_dim:]
    # rep3 folded into the vdf blocks (see kernel pack_gcp1_weights):
    # [., 3] -> [., 9] so the kernel scalarize is VPU-elementwise only
    rep = _rep3_jnp(dtype)
    wdf_i, wdf_e, wdf_j = (
        wdf[:v_dim] @ rep, wdf[v_dim:v_dim + ve_dim] @ rep, wdf[v_dim + ve_dim:] @ rep,
    )
    se_dim = ws.shape[0] - 2 * s_dim - h - 9

    return {
        "wvi": jnp.concatenate([_bd3(wd_i), _bd3(wdf_i)], axis=1),
        "wvj": jnp.concatenate([_bd3(wd_j), _bd3(wdf_j)], axis=1),
        "wve": jnp.concatenate([_bd3(wd_e), _bd3(wdf_e)], axis=1),  # [3Ve, 3H+27]
        "wsi": ws[:s_dim],
        "wsj": ws[s_dim + se_dim: 2 * s_dim + se_dim],
        # fused [Se+H+9, S] matmul for the edge-local s2 terms
        "wsx": jnp.concatenate([
            ws[s_dim: s_dim + se_dim],                         # wse
            ws[2 * s_dim + se_dim: 2 * s_dim + se_dim + h],    # wsvn
            ws[2 * s_dim + se_dim + h:],                       # wssc
        ], axis=0),
        "bs": bs,
        "wu_bd": _bd3(wu),  # [3H, 3Vout]
        "wg": wg,
        "bg": bg,
    }


def pack_chain_weights_jnp(mp: Dict[str, Any], num_message_layers: int, dtype) -> tuple:
    """Differentiable chain packing -> the fused_message_layer chain tuple."""
    wd, wdf, ws, bs, wu, wg, bg, wattn, battn = _stack_chain_weights(
        mp, num_message_layers, dtype
    )
    wdf_rep = wdf @ _rep3_jnp(dtype)  # rep3 folded: [G, V, 3] -> [G, V, 9]
    w_comb = jnp.concatenate(
        [_bd3_batched(wd), _bd3_batched(wdf_rep)], axis=2
    )  # [G, 3V, 3H+27]
    wu_bd = _bd3_batched(wu)  # [G, 3H, 3V]
    return (w_comb, ws, bs, wu_bd, wg, bg, wattn, battn)


# ---------------------------------------------------------------------------
# packed-layout message layer: jnp reference math + custom-VJP Pallas wrapper
# ---------------------------------------------------------------------------


def message_layer_reference(s_node: Array, v_node: Array, epack: Array,
                            g1: Dict[str, Array], chain: tuple, *, ve_dim: int
                            ) -> Tuple[Array, Array]:
    """jnp math of the Pallas mega-kernel (_message_layer_kernel), on the
    same packed inputs/weights.  Differentiable; used as the custom-VJP
    backward (recompute) and as the XLA packed-layout fallback.

    Returns (s_agg [B,N,S], v_agg [B,N,3V] coords-major).
    """
    b, n, s_dim = s_node.shape
    v3 = v_node.shape[-1]
    dt = s_node.dtype
    h1 = g1["wu_bd"].shape[0] // 3
    se = g1["wsx"].shape[0] - h1 - 9
    h3 = 3 * h1

    ep = epack.reshape(b, n, n, epack.shape[-1])
    e_feat = ep[..., :se]
    xi = ep[..., se: se + 3 * ve_dim]
    ft = ep[..., se + 3 * ve_dim: se + 3 * ve_dim + 9]
    emask = ep[..., se + 3 * ve_dim + 9: se + 3 * ve_dim + 10]

    # lane-tiled frame factors (the rep3 expansion of vdf is folded into
    # the packed weights, so the scalarize is pure elementwise — no selector
    # matmuls in fwd OR in XLA's AD transpose)
    ftiles = [
        jnp.concatenate([ft[..., 3 * k: 3 * (k + 1)].astype(dt)] * 3, axis=-1)
        for k in range(3)
    ]

    def scalarize(vdfrep_cols):  # [..., 27] (9 c-major cols per coordinate)
        return sum(
            vdfrep_cols[..., 9 * k: 9 * (k + 1)] * ftiles[k] for k in range(3)
        )

    # ---- GCP1 over the virtual concat (node_i | edge | node_j) ----
    vhd = (
        (v_node @ g1["wvi"])[:, :, None]
        + (v_node @ g1["wvj"])[:, None, :]
        + xi @ g1["wve"]
    )  # [B,N,N,3H1+27]
    vh_sq = sum(vhd[..., k * h1:(k + 1) * h1] ** 2 for k in range(3))
    vnorm = _safe_norm_last(vh_sq)
    schid = scalarize(vhd[..., h3:])
    # edge-local s2 terms as one fused matmul (wsx = [wse; wsvn; wssc])
    cat1 = jnp.concatenate([e_feat, vnorm.astype(dt), schid.astype(dt)], axis=-1)
    s2 = (
        (s_node @ g1["wsi"])[:, :, None]
        + (s_node @ g1["wsj"])[:, None, :]
        + cat1 @ g1["wsx"]
        + g1["bs"]
    )
    silu1 = jax.nn.silu(s2)
    gate1 = jax.nn.sigmoid(silu1 @ g1["wg"] + g1["bg"])
    vu1 = vhd[..., :h3] @ g1["wu_bd"]  # [B,N,N,3V]
    s = silu1
    v = vu1 * jnp.concatenate([gate1] * 3, axis=-1)

    # ---- residual chain of secondary GCPs ----
    w_comb, wsc, bsc, wu_bd, wgc, bgc, wattn, battn = chain
    num_gcps = w_comb.shape[0]
    hc = (w_comb.shape[2] - 27) // 3
    hc3 = 3 * hc
    for g in range(num_gcps):
        vhd_g = v @ w_comb[g]
        vh_sq = sum(vhd_g[..., k * hc:(k + 1) * hc] ** 2 for k in range(3))
        vnorm_g = _safe_norm_last(vh_sq)
        schid_g = scalarize(vhd_g[..., hc3:])
        merged = jnp.concatenate([s, vnorm_g.astype(dt), schid_g.astype(dt)], axis=-1)
        s2_g = merged @ wsc[g] + bsc[g]
        silu_g = jax.nn.silu(s2_g)
        gate_g = jax.nn.sigmoid(silu_g @ wgc[g] + bgc[g])
        vu_g = vhd_g[..., :hc3] @ wu_bd[g]
        s = s + silu_g
        v = v + vu_g * jnp.concatenate([gate_g] * 3, axis=-1)

    attn = jax.nn.sigmoid(s @ wattn + battn)
    s = s * attn * emask.astype(dt)
    v = v * emask.astype(dt)

    # masked aggregation over targets j
    return jnp.sum(s, axis=2), jnp.sum(v, axis=2)


@functools.lru_cache(maxsize=None)
def make_message_layer_fn(ve_dim: int, use_pallas: bool, interpret: bool = False,
                          kernel_bwd: bool = True, mesh=None):
    """(s_node, v_node, epack, g1, chain) -> (s_agg, v_agg), differentiable.

    With ``use_pallas``: Pallas mega-kernel forward + custom VJP.  The
    backward is the handwritten Pallas backward kernel
    (ops/pallas/gcp_kernel.py::fused_message_layer_bwd — recomputes the
    forward in VMEM, emits input + weight grads in one pass) when
    ``kernel_bwd`` and the molecule fits whole-molecule cells; otherwise AD
    through :func:`message_layer_reference` (recompute — the custom VJP is
    its own remat either way).  Without ``use_pallas``: the jnp reference
    directly.

    With ``mesh``: the kernel (pallas_call cannot be GSPMD-partitioned) is
    wrapped in ``jax.shard_map`` over the mesh's 'data' axis — each shard
    runs the kernel on its local batch rows; the replicated weight pytrees
    (in_spec P()) get their cotangents psum-reduced by the shard_map
    transpose, which IS the DP gradient all-reduce.  Multi-chip training
    keeps the Pallas path (VERDICT r2 #5).
    """
    ref = functools.partial(message_layer_reference, ve_dim=ve_dim)
    if not use_pallas:
        return ref

    from bio_diffusion_tpu.ops.pallas.gcp_kernel import (
        WHOLE_MOL_ROWS, fused_message_layer_bwd,
    )

    @jax.custom_vjp
    def layer(s_node, v_node, epack, g1, chain):
        return fused_message_layer(
            s_node, v_node, epack, g1, chain, ve_dim=ve_dim, interpret=interpret
        )

    def fwd(s_node, v_node, epack, g1, chain):
        return layer(s_node, v_node, epack, g1, chain), (s_node, v_node, epack, g1, chain)

    def bwd(residuals, cotangents):
        s_node, v_node, epack, g1, chain = residuals
        n = s_node.shape[1]
        # the bwd kernel covers whole-molecule cells AND the sub-molecule
        # tiling (n % 8 == 0, guaranteed by _pad_nodes for large n) — the
        # full GEOM 44-181-atom range trains through it.  AD recompute only
        # remains for oversize molecules with an illegal node count.
        if kernel_bwd and (n * n <= WHOLE_MOL_ROWS or n % 8 == 0):
            return fused_message_layer_bwd(
                s_node, v_node, epack, g1, chain, cotangents,
                ve_dim=ve_dim, interpret=interpret,
            )
        _, vjp = jax.vjp(ref, *residuals)
        return vjp(cotangents)

    layer.defvjp(fwd, bwd)
    if mesh is None:
        return layer

    from jax.sharding import PartitionSpec as P

    sharded = jax.shard_map(
        layer,
        mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P(), P()),
        out_specs=(P("data"), P("data")),
        check_vma=False,
    )
    dp = int(mesh.shape.get("data", 1))

    def dispatch(s_node, v_node, epack, g1, chain):
        # shard_map requires the batch to divide the data axis; ragged final
        # batches (drop_last=False loaders replicate them, train/loop.py
        # _shard) take the GSPMD-partitionable packed-XLA path instead —
        # same math, just not kernel-accelerated.  Static at trace time.
        if s_node.shape[0] % dp:
            return ref(s_node, v_node, epack, g1, chain)
        return sharded(s_node, v_node, epack, g1, chain)

    return dispatch


# ---------------------------------------------------------------------------
# shared featurization / per-layer node update
# ---------------------------------------------------------------------------


def _pad_nodes(xh, node_mask, context, xh_self_cond, use_pallas: bool):
    """Large molecules need sub-molecule kernel tiles, whose output blocks
    require the node axis to divide into multiples of 8 — pad minimally
    (masked rows; results unchanged).  Small molecules (n*n <= 1200) use
    whole-molecule blocks and stay unpadded."""
    n_orig = node_mask.shape[-1]
    from bio_diffusion_tpu.ops.pallas.gcp_kernel import WHOLE_MOL_ROWS

    n_pad = ((-n_orig) % 8) if (use_pallas and n_orig * n_orig > WHOLE_MOL_ROWS) else 0
    if n_pad:
        padw = ((0, 0), (0, n_pad), (0, 0))
        xh = jnp.pad(xh, padw)
        node_mask = jnp.pad(node_mask, ((0, 0), (0, n_pad)))
        if context is not None:
            context = jnp.pad(context, padw)
        if xh_self_cond is not None:
            xh_self_cond = jnp.pad(xh_self_cond, padw)
    return xh, node_mask, context, xh_self_cond, n_orig, n_pad


def _featurize(xh, t, node_mask, context, xh_self_cond, *, nx, dc, mod, n_cond, cdt):
    """Input featurization shared by the baked and trainable fast forwards:
    orientations/edge features/self-cond/time/context concat + frames."""
    mask_f = node_mask.astype(xh.dtype)
    xh = xh * mask_f[..., None]
    x_init = xh[..., :nx]
    h = xh[..., nx:]
    b, n = node_mask.shape
    edge_mask = build_edge_mask(node_mask).astype(jnp.float32)

    chi = orientations(x_init, node_mask)  # [B,N,2,3]
    e_s, e_v = edge_features(x_init, edge_mask)  # [B,N,N,1], [B,N,N,1,3]

    if dc.self_condition:
        sc_in = xh_self_cond if xh_self_cond is not None else jnp.zeros_like(xh)
        chi_sc = orientations(sc_in[..., :nx], node_mask)
        e_s_sc, e_v_sc = edge_features(sc_in[..., :nx], edge_mask)
        h = jnp.concatenate([h, sc_in[..., nx:]], -1)
        chi = jnp.concatenate([chi, chi_sc], -2)
        e_s = jnp.concatenate([e_s, e_s_sc], -1)
        e_v = jnp.concatenate([e_v, e_v_sc], -2)

    if dc.condition_on_time:
        h_time = jnp.broadcast_to(t[..., None, :], t.shape[:-1] + (n, 1)).astype(h.dtype)
        h = jnp.concatenate([h, h_time], -1)
    if n_cond > 0:
        h = jnp.concatenate([h, context.astype(h.dtype)], -1)

    _, x_cent = centralize(x_init, node_mask)
    f_ij = localize(x_cent, edge_mask, norm_x_diff=mod.norm_x_diff)
    f_node = node_mean_frames(f_ij, edge_mask)
    # coordinate-major (transposed) flat frames for the kernel layout
    frames_flat = jnp.swapaxes(f_ij, -1, -2).reshape(b * n * n, 9).astype(cdt)

    h = h.astype(cdt)
    chi_cm = jnp.swapaxes(chi, -1, -2).astype(cdt)  # [B,N,3,V]
    e_s = e_s.astype(cdt)
    ev_cm = jnp.swapaxes(e_v, -1, -2).astype(cdt)  # [B,N,N,3,Ve]

    return dict(
        mask_f=mask_f, x_init=x_init, h=h, chi_cm=chi_cm, e_s=e_s, ev_cm=ev_cm,
        edge_mask=edge_mask, x_cent=x_cent,
        f_ij_c=f_ij.astype(cdt), f_node_c=f_node.astype(cdt),
        frames_flat=frames_flat, b=b, n=n,
    )


def _build_epack(e_emb, xi_emb, frames_flat, edge_mask, b, n, ve_dim, cdt):
    """Pack all per-edge features into ONE 128-lane-aligned tensor
    [B, N*N, P]: embedded edge scalars | coords-major edge vectors |
    transposed frames | edge mask | zero pad."""
    se = e_emb.shape[-1]
    ve3 = 3 * ve_dim
    width = se + ve3 + 9 + 1
    pad_w = (-width) % 128
    parts = [
        e_emb,
        xi_emb.reshape(b, n, n, ve3),
        frames_flat.reshape(b, n, n, 9).astype(cdt),
        edge_mask[..., None].astype(cdt),
    ]
    if pad_w:
        parts.append(jnp.zeros((b, n, n, pad_w), cdt))
    return jnp.concatenate(parts, axis=-1).reshape(b, n * n, width + pad_w)


def quantize_epack(epack: Array) -> Tuple[Array, Array]:
    """Per-lane symmetric int8 quantization of the packed edge tensor
    (PALLAS_EPACK_INT8 experiment — halves the per-layer HBM fetch of the
    kernel's largest input; the kernel dequantizes in VMEM)."""
    scales = jnp.maximum(
        jnp.max(jnp.abs(epack.astype(jnp.float32)), axis=(0, 1)), 1e-8
    ) / 127.0  # [P]
    q = jnp.clip(jnp.round(epack.astype(jnp.float32) / scales), -127, 127)
    return q.astype(jnp.int8), scales


def _node_update(layer: Dict[str, Any], s_agg, v_agg, s_node, v_node, f_node_c,
                 mask_f, x, node_positions_weight: float, cdt):
    """Feedforward + position update shared by both fast forwards."""
    s_cat = jnp.concatenate([s_agg, s_node], -1)
    v_cat = jnp.concatenate([v_agg, v_node], -1)
    s_ff, v_ff = _gcp2_apply_cm(
        layer["feedforward_network_0"], s_cat, v_cat, f_node_c,
        scalar_act=False, gate_act=None, feedforward_out=True,
    )
    s_node = (s_node + s_ff) * mask_f[..., None].astype(cdt)
    v_node = (v_node + v_ff) * mask_f[..., None, None].astype(cdt)

    s_pu, v_pu = _gcp2_apply_cm(
        layer["node_position_update_gcp"], s_node, v_node, f_node_c, scalar_act=True
    )
    x_update = v_pu[..., :, 0].astype(jnp.float32)  # [B,N,3]
    x = x + x_update * node_positions_weight
    x = x * mask_f[..., None]
    return s_node, v_node, x


def _decode_outputs(x, x_init, h_out, mask_f, node_mask, n_cond, condition_on_time,
                    n_orig, n_pad):
    vel = (x - x_init) * mask_f[..., None]
    if n_cond > 0:
        h_out = h_out[..., : h_out.shape[-1] - n_cond]
    if condition_on_time:
        h_out = h_out[..., :-1]
    vel_ok = jnp.all(jnp.isfinite(vel))
    vel = jnp.where(vel_ok, vel, jnp.zeros_like(vel))
    _, vel = centralize(vel, node_mask)
    out = jnp.concatenate([vel, h_out], -1)
    if n_pad:
        out = out[:, :n_orig]
    return out


def _message_passing_fast(
    mp: Dict[str, Any],
    s_node: Array,  # [B, N, S]
    v_node_cm: Array,  # [B, N, 3, V]
    e: Array,  # [B, N, N, Se]
    xi_cm: Array,  # [B, N, N, 3, Ve]
    frames_flat: Array,  # [E, 9]
    edge_mask: Array,  # [B, N, N]
    num_message_layers: int,
    use_pallas: bool,
    interpret: bool,
) -> Tuple[Array, Array]:
    """Full message stack -> aggregated (s [B,N,S], v_cm [B,N,3,V]).

    Split-weight first GCP on [B,N,N,.] tensors; chain via the edge-flat
    Pallas kernel or an identical-math XLA loop (CPU tests)."""
    dt = s_node.dtype
    b, n, s_dim = s_node.shape
    v_dim = v_node_cm.shape[-1]
    ve_dim = xi_cm.shape[-1]
    e_count = b * n * n

    w1 = mp["message_fusion_0"]
    # --- first GCP: split-weight evaluation (math of GCP2FusedEdgeMessage) ---
    wd = w1["vector_down"]["kernel"].astype(dt)  # [2V+Ve, H]
    wdf = w1["vector_down_frames"]["kernel"].astype(dt)  # [2V+Ve, 3]
    wd_i, wd_e, wd_j = wd[:v_dim], wd[v_dim:v_dim + ve_dim], wd[v_dim + ve_dim:]
    wdf_i, wdf_e, wdf_j = wdf[:v_dim], wdf[v_dim:v_dim + ve_dim], wdf[v_dim + ve_dim:]

    vh = (
        (v_node_cm @ wd_i)[:, :, None]
        + xi_cm @ wd_e
        + (v_node_cm @ wd_j)[:, None, :]
    )  # [B,N,N,3,H]
    vnorm = _safe_norm_last(jnp.sum(vh * vh, axis=-2)).astype(dt)
    vdf = (
        (v_node_cm @ wdf_i)[:, :, None]
        + xi_cm @ wdf_e
        + (v_node_cm @ wdf_j)[:, None, :]
    )  # [B,N,N,3,3]
    frames4_t = frames_flat.reshape(b, n, n, 3, 3).astype(dt)  # [.., k, a]
    sc = jnp.einsum("...ka,...kc->...ca", frames4_t, vdf)
    sc = sc.reshape(b, n, n, 9)

    ws = w1["scalar_out_head"]["scalar_out"]["kernel"].astype(dt)
    bs1 = w1["scalar_out_head"]["scalar_out"]["bias"].astype(dt)
    h_dim = vh.shape[-1]
    ws_i = ws[:s_dim]
    ws_e = ws[s_dim: s_dim + e.shape[-1]]
    ws_j = ws[s_dim + e.shape[-1]: 2 * s_dim + e.shape[-1]]
    ws_vn = ws[2 * s_dim + e.shape[-1]: 2 * s_dim + e.shape[-1] + h_dim]
    ws_sc = ws[2 * s_dim + e.shape[-1] + h_dim:]

    s2 = (
        (s_node @ ws_i)[:, :, None]
        + e @ ws_e
        + (s_node @ ws_j)[:, None, :]
        + vnorm @ ws_vn
        + sc @ ws_sc
        + bs1
    )  # [B,N,N,S]
    gate = jax.nn.sigmoid(
        jax.nn.silu(s2) @ w1["vector_out_scale"]["kernel"].astype(dt)
        + w1["vector_out_scale"]["bias"].astype(dt)
    )
    v1 = (vh @ w1["vector_up"]["kernel"].astype(dt)) * gate[..., None, :]  # [B,N,N,3,V]
    s1 = jax.nn.silu(s2)

    # --- secondary chain + attention ---
    s_flat = s1.reshape(e_count, s_dim)
    v_flat = v1.reshape(e_count, 3 * v_dim)
    chain_w = _stack_chain_weights(mp, num_message_layers, dt)

    if use_pallas:
        s_out, v_out = fused_gcp2_chain(
            s_flat, v_flat, frames_flat.astype(dt), *chain_w, interpret=interpret
        )
    else:  # XLA fallback with identical math (used for CPU tests)
        s_out, v_out = s_flat, v_flat
        wd_c, wdf_c, ws_c, bs_c, wu_c, wg_c, bg_c, wattn, battn = chain_w
        for g in range(num_message_layers - 1):
            vks = v_out.reshape(e_count, 3, v_dim)
            vh_g = vks @ wd_c[g]
            vnorm_g = _safe_norm_last(jnp.sum(vh_g * vh_g, axis=-2))
            vdf_g = vks @ wdf_c[g]
            f3_t = frames_flat.reshape(e_count, 3, 3).astype(dt)  # [k, a]
            sc_g = jnp.einsum("...ka,...kc->...ca", f3_t, vdf_g).reshape(e_count, 9)
            merged = jnp.concatenate([s_out, vnorm_g.astype(dt), sc_g], -1)
            s2_g = merged @ ws_c[g] + bs_c[g]
            gate_g = jax.nn.sigmoid(jax.nn.silu(s2_g) @ wg_c[g] + bg_c[g])
            v_new = (vh_g @ wu_c[g]) * gate_g[..., None, :]
            s_out = s_out + jax.nn.silu(s2_g)
            v_out = v_out + v_new.reshape(e_count, 3 * v_dim)
        attn = jax.nn.sigmoid(s_out @ chain_w[7] + chain_w[8])
        s_out = s_out * attn

    # --- masked aggregation over targets j ---
    em = edge_mask.astype(dt)
    s_agg = jnp.sum(s_out.reshape(b, n, n, s_dim) * em[..., None], axis=2)
    v_agg = jnp.sum(v_out.reshape(b, n, n, 3, v_dim) * em[..., None, None], axis=2)
    return s_agg, v_agg


# ---------------------------------------------------------------------------
# inference: baked-weight forward
# ---------------------------------------------------------------------------


def make_fast_dynamics(
    model_cfg: ModelConfig,
    module_cfg: ModuleConfig,
    layer_cfg: LayerConfig,
    diffusion_cfg: DiffusionConfig,
    dataloader_cfg: DataloaderConfig,
    params: Dict[str, Any],
    compute_dtype: Optional[str] = "bfloat16",
    use_pallas: bool = True,
    interpret: bool = False,
    mesh=None,
):
    """Build fn(xh, t, node_mask, context, xh_self_cond) closing over weights.

    ``params``: the full EVD variables dict ({'params': {'dynamics': ...}})
    or the dynamics variables ({'params': ...}).

    With ``mesh``: multi-chip data-parallel SAMPLING — the Pallas message
    kernel (not GSPMD-partitionable) runs per-shard under jax.shard_map on
    the mesh's 'data' axis, exactly like the trainable path
    (make_message_layer_fn); everything else partitions under GSPMD from
    the sharded batch inputs (SegmentedSampler.run device_puts them).
    """
    assert supports_fast_path(module_cfg, layer_cfg), "config not supported by the fast path"
    p = params["params"]
    dyn = p["dynamics"] if "dynamics" in p else p

    mc, mod, dc, dl = model_cfg, module_cfg, diffusion_cfg, dataloader_cfg
    cdt = jnp.dtype(compute_dtype) if compute_dtype else jnp.float32

    # pre-pack per-layer kernel weights (host-side, once per weight set)
    mega_layers = None
    if use_pallas:
        import numpy as _np

        mega_layers = []
        for i in range(mc.num_encoder_layers):
            mp = dyn[f"interaction_layers_{i}"]["interaction"]
            g1 = pack_gcp1_weights(
                mp["message_fusion_0"], s_dim=mc.h_hidden_dim,
                v_dim=mc.chi_hidden_dim, ve_dim=mc.xi_hidden_dim,
            )
            g1 = {k: jnp.asarray(v, cdt) for k, v in g1.items()
                  if isinstance(v, _np.ndarray)}
            cw = _stack_chain_weights(mp, layer_cfg.mp_cfg.num_message_layers, cdt)
            wd_c, wdf_c, ws_c, bs_c, wu_c, wg_c, bg_c, wattn, battn = cw
            w_comb, wu_bd = pack_chain_weights(wd_c, wdf_c, wu_c)
            chain = (jnp.asarray(w_comb, cdt), ws_c, bs_c,
                     jnp.asarray(wu_bd, cdt), wg_c, bg_c, wattn, battn)
            mega_layers.append((g1, chain))
    nx = dl.num_x_dims
    n_cond = len(mod.conditioning)
    layer_fn = (
        make_message_layer_fn(mc.xi_hidden_dim, use_pallas=True,
                              interpret=interpret, mesh=mesh)
        if use_pallas else None
    )
    # int8 epack experiment (single-chip inference only; see quantize_epack)
    epack_int8 = (
        use_pallas and mesh is None
        and os.environ.get("PALLAS_EPACK_INT8") == "1"
    )

    def forward(xh, t, node_mask, context=None, xh_self_cond=None, deterministic=True):
        xh, node_mask, context, xh_self_cond, n_orig, n_pad = _pad_nodes(
            xh, node_mask, context, xh_self_cond, use_pallas
        )
        f = _featurize(xh, t, node_mask, context, xh_self_cond,
                       nx=nx, dc=dc, mod=mod, n_cond=n_cond, cdt=cdt)
        b, n = f["b"], f["n"]

        emb = dyn["gcp_embedding"]
        if use_pallas:
            e_emb, xi_emb = _gcp2_edge_wide(
                emb["edge_embedding"], f["e_s"], f["ev_cm"], f["frames_flat"],
                gate_act="silu",
            )
        else:
            e_emb, xi_emb = _gcp2_apply_cm(
                emb["edge_embedding"], f["e_s"], f["ev_cm"], f["f_ij_c"], scalar_act=True
            )
        h_emb, chi_emb = _gcp2_apply_cm(
            emb["node_embedding"], f["h"], f["chi_cm"], f["f_node_c"],
            scalar_act=False, gate_act=None,
        )

        x = f["x_cent"]
        s_node, v_node = h_emb, chi_emb

        epack, epack_scales = None, None
        if use_pallas:
            epack = _build_epack(
                e_emb, xi_emb, f["frames_flat"], f["edge_mask"], b, n,
                mc.xi_hidden_dim, cdt,
            )
            # int8 epack needs whole-molecule kernel cells: for large
            # molecules where the kernel tiles sub-molecule
            # (select_tile(n) != n), fall back to the fp path instead of
            # tripping the kernel's assertion (ADVICE r4)
            from bio_diffusion_tpu.ops.pallas.gcp_kernel import select_tile

            if epack_int8 and select_tile(n) == n:
                epack, epack_scales = quantize_epack(epack)

        for i in range(mc.num_encoder_layers):
            layer = dyn[f"interaction_layers_{i}"]
            if use_pallas:
                g1, chain = mega_layers[i]
                if epack_scales is not None:
                    # inference-only experiment path: no VJP wrapper needed
                    s_agg, v_agg3 = fused_message_layer(
                        s_node, v_node.reshape(b, n, 3 * mc.chi_hidden_dim),
                        epack, g1, chain, ve_dim=mc.xi_hidden_dim,
                        interpret=interpret, epack_scales=epack_scales,
                    )
                else:
                    s_agg, v_agg3 = layer_fn(
                        s_node, v_node.reshape(b, n, 3 * mc.chi_hidden_dim),
                        epack, g1, chain,
                    )
                v_agg = v_agg3.reshape(b, n, 3, mc.chi_hidden_dim)
            else:
                s_agg, v_agg = _message_passing_fast(
                    layer["interaction"], s_node, v_node, e_emb, xi_emb,
                    f["frames_flat"], f["edge_mask"],
                    layer_cfg.mp_cfg.num_message_layers, use_pallas, interpret,
                )
            s_node, v_node, x = _node_update(
                layer, s_agg, v_agg, s_node, v_node, f["f_node_c"], f["mask_f"], x,
                mod.node_positions_weight, cdt,
            )

        h_out, _ = _gcp2_apply_cm(
            dyn["scalar_node_projection_gcp"], s_node, v_node, f["f_node_c"],
            scalar_act=False,
        )
        return _decode_outputs(
            x, f["x_init"], h_out.astype(jnp.float32), f["mask_f"], node_mask,
            n_cond, dc.condition_on_time, n_orig, n_pad,
        )

    return forward


# ---------------------------------------------------------------------------
# training: adopted-tree flax module (same params as GCPNetDynamics)
# ---------------------------------------------------------------------------


def fast_forward_trainable(
    dyn: Dict[str, Any],
    xh: Array,
    t: Array,
    node_mask: Array,
    context: Optional[Array],
    xh_self_cond: Optional[Array],
    *,
    model_cfg: ModelConfig,
    module_cfg: ModuleConfig,
    layer_cfg: LayerConfig,
    diffusion_cfg: DiffusionConfig,
    dataloader_cfg: DataloaderConfig,
    compute_dtype: Optional[str],
    use_pallas: bool,
    interpret: bool = False,
    mesh=None,
) -> Array:
    """Packed-layout forward taking the weight tree as an ARGUMENT
    (differentiable end to end).  Kernel packing is jnp (grads flow through);
    the message layer runs the Pallas mega-kernel under a custom VJP (or the
    jnp reference when ``use_pallas`` is False).  ``mesh`` shard_maps the
    kernel over the 'data' axis (see make_message_layer_fn)."""
    mc, mod, dc, dl = model_cfg, module_cfg, diffusion_cfg, dataloader_cfg
    cdt = jnp.dtype(compute_dtype) if compute_dtype else jnp.float32
    nx = dl.num_x_dims
    n_cond = len(mod.conditioning)

    xh, node_mask, context, xh_self_cond, n_orig, n_pad = _pad_nodes(
        xh, node_mask, context, xh_self_cond, use_pallas
    )
    f = _featurize(xh, t, node_mask, context, xh_self_cond,
                   nx=nx, dc=dc, mod=mod, n_cond=n_cond, cdt=cdt)
    b, n = f["b"], f["n"]

    emb = dyn["gcp_embedding"]
    e_emb, xi_emb = _gcp2_edge_wide(
        emb["edge_embedding"], f["e_s"], f["ev_cm"], f["frames_flat"], gate_act="silu"
    )
    h_emb, chi_emb = _gcp2_apply_cm(
        emb["node_embedding"], f["h"], f["chi_cm"], f["f_node_c"],
        scalar_act=False, gate_act=None,
    )

    epack = _build_epack(
        e_emb, xi_emb, f["frames_flat"], f["edge_mask"], b, n, mc.xi_hidden_dim, cdt
    )
    layer_fn = make_message_layer_fn(mc.xi_hidden_dim, use_pallas, interpret, mesh=mesh)

    x = f["x_cent"]
    s_node, v_node = h_emb, chi_emb
    for i in range(mc.num_encoder_layers):
        layer = dyn[f"interaction_layers_{i}"]
        mp = layer["interaction"]
        g1 = pack_gcp1_weights_jnp(
            mp["message_fusion_0"], s_dim=mc.h_hidden_dim,
            v_dim=mc.chi_hidden_dim, ve_dim=mc.xi_hidden_dim, dtype=cdt,
        )
        chain = pack_chain_weights_jnp(mp, layer_cfg.mp_cfg.num_message_layers, cdt)
        s_agg, v_agg3 = layer_fn(
            s_node, v_node.reshape(b, n, 3 * mc.chi_hidden_dim), epack, g1, chain
        )
        v_agg = v_agg3.reshape(b, n, 3, mc.chi_hidden_dim)
        s_node, v_node, x = _node_update(
            layer, s_agg, v_agg, s_node, v_node, f["f_node_c"], f["mask_f"], x,
            mod.node_positions_weight, cdt,
        )

    h_out, _ = _gcp2_apply_cm(
        dyn["scalar_node_projection_gcp"], s_node, v_node, f["f_node_c"],
        scalar_act=False,
    )
    return _decode_outputs(
        x, f["x_init"], h_out.astype(jnp.float32), f["mask_f"], node_mask,
        n_cond, dc.condition_on_time, n_orig, n_pad,
    )


class FastGCPNetDynamics(nn.Module):
    """Drop-in trainable replacement for GCPNetDynamics with the SAME
    parameter tree: each top-level submodule subtree is adopted as one
    pytree-valued flax param, so checkpoints/EMA/optimizer state are
    interchangeable between the two modules.

    Use ``evd.clone(dynamics=FastGCPNetDynamics(...))`` for the train step;
    initialize params via the module path (or this module — init builds a
    GCPNetDynamics internally to produce identical structure).
    """

    model_cfg: ModelConfig
    module_cfg: ModuleConfig
    layer_cfg: LayerConfig
    diffusion_cfg: DiffusionConfig
    dataloader_cfg: DataloaderConfig
    compute_dtype: Optional[str] = None
    use_pallas: bool = True
    interpret: bool = False
    # a jax.sharding.Mesh: shard_map the Pallas message layer over its 'data'
    # axis so multi-chip DP training keeps the kernel path (None = no mesh)
    mesh: Optional[Any] = None

    @property
    def num_x_dims(self) -> int:
        return self.dataloader_cfg.num_x_dims

    @nn.compact
    def __call__(self, xh, t, node_mask, context=None, xh_self_cond=None,
                 deterministic=True):
        assert supports_fast_path(self.module_cfg, self.layer_cfg), (
            "config not supported by the fast path; use GCPNetDynamics"
        )
        names = (
            ["gcp_embedding"]
            + [f"interaction_layers_{i}" for i in range(self.model_cfg.num_encoder_layers)]
            + ["scalar_node_projection_gcp"]
        )

        def subtree_init(name):
            def init_fn(rng):
                # structure-identical init: run the module path once and
                # pull this submodule's subtree (used only by .init; apply
                # fetches stored values without calling this)
                from bio_diffusion_tpu.models.gcpnet import GCPNetDynamics

                module = GCPNetDynamics(
                    self.model_cfg, self.module_cfg, self.layer_cfg,
                    self.diffusion_cfg, self.dataloader_cfg,
                    remat_interactions=False, compute_dtype=self.compute_dtype,
                )
                variables = module.init(
                    rng, xh, t, node_mask, context=context,
                    xh_self_cond=xh_self_cond, deterministic=True,
                )
                return variables["params"][name]

            return init_fn

        dyn = {name: self.param(name, subtree_init(name)) for name in names}
        return fast_forward_trainable(
            dyn, xh, t, node_mask, context, xh_self_cond,
            model_cfg=self.model_cfg, module_cfg=self.module_cfg,
            layer_cfg=self.layer_cfg, diffusion_cfg=self.diffusion_cfg,
            dataloader_cfg=self.dataloader_cfg,
            compute_dtype=self.compute_dtype, use_pallas=self.use_pallas,
            interpret=self.interpret, mesh=self.mesh,
        )
