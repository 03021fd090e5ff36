"""Fused Pallas kernel: the residual chain of secondary message GCP2s.

The denoiser's hot loop is GCPMessagePassing's message stack — after the
(already split-weight-fused) first GCP, three identical-shape GCP2s run
per edge with residual accumulation, then sigmoid scalar attention
(gcpnet.py:696-713).  Under XLA each GCP costs ~10 HBM round trips over the
[E, 256]-scale edge tensors; this kernel runs the whole chain (+ attention)
in one pass with everything resident in VMEM: per block of edges, inputs
are read once and outputs written once.

Layout contract (kernel-side, all 2D):
  * s        [E, S]      scalar channels
  * v        [E, 3*V]    vector channels, COORDS-MAJOR: column k*V+c is
                         coordinate k of channel c
  * frames_t [E, 9]      TRANSPOSED frames, flattened k*3+a (coordinate-major)
                         — lets the scalarize be pure lane tile/repeat ops
  * stacked weights per chain step (identical shapes across the 3 GCPs)

Math per GCP2 (vector_gate config; matches models/gcp.py GCP2 exactly):
  vh_k    = v_k @ Wd                      (k = x,y,z)
  vnorm   = sqrt(sum_k vh_k^2 + eps) + eps
  vdf_k   = v_k @ Wdf
  schid[., c*3+a] = sum_k frames[., a, k] * vdf_k[., c]
                  = sum_k repeat(vdf_k, 3)[., c*3+a] * tile(frames_t[., 3k:3k+3], 3)[., c*3+a]
  s2      = [s | vnorm | schid] @ Ws + bs
  gate    = sigmoid(silu(s2) @ Wg + bg)
  v'_k    = (vh_k @ Wu) * gate ;  s' = silu(s2)
  residual: s <- s + s', v <- v + v'

Used on the inference/sampling path with baked weights, and on the training
path (trainer.fast_train=pallas) with traced weights under a custom VJP
whose backward is the jnp packed-layout reference
(models/gcpnet_fast.py::message_layer_reference).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 1024
# max edge rows per whole-molecule grid cell (VMEM-bounded); molecules with
# n*n above this use sub-molecule tiling (which requires n % 8 == 0)
WHOLE_MOL_ROWS = 2600


def select_tile(n: int) -> int:
    """Source-tile size shared by the fwd and bwd wrappers (they MUST agree:
    different tilings per direction would mean different numerics/VMEM
    behavior).  Whole molecule when its n*n edge rows fit a cell, else the
    largest multiple of 8 that divides n (output blocks need ti % 8 == 0;
    callers pad n to a multiple of 8 — gcpnet_fast._pad_nodes)."""
    if n * n <= WHOLE_MOL_ROWS:
        return n
    ti = max(8, (WHOLE_MOL_ROWS // n) // 8 * 8)
    while n % ti != 0 and ti > 8:
        ti -= 8
    return ti


def select_fusion(b: int, n: int) -> int:
    """Molecules fused per whole-molecule grid cell ([B,N,.] -> [B/G,G*N,.]
    reshaped outside the kernel).  Bounded by VMEM cell rows
    (PALLAS_FUSE_BUDGET_ROWS) and PALLAS_FUSE_MAX; G must divide B.  G=5 at
    QM9 sizes measured optimal (G in {1,2,5,10} all benched, BASELINE.md)."""
    budget_rows = int(os.environ.get("PALLAS_FUSE_BUDGET_ROWS", 2048))
    fuse_max = int(os.environ.get("PALLAS_FUSE_MAX", 8))
    budget = max(1, budget_rows // (n * n))
    for cand in range(min(b, budget, fuse_max), 0, -1):
        if b % cand == 0:
            return cand
    return 1


def _sigmoid(x):
    """Kernel sigmoid via the exact identity sigmoid(x) = 0.5*(tanh(x/2)+1).

    Mosaic's tanh lowering is substantially cheaper than its exp-based
    sigmoid on the VPU, and the sampling kernel is transcendental-bound
    (BASELINE.md roofline): tanh form measured 21,346 evals/s vs 18,940
    for jax.nn.sigmoid on the QM9 headline bench (+12.7%).  Set
    PALLAS_EXP_SIGMOID=1 to A/B the exp lowering."""
    if os.environ.get("PALLAS_EXP_SIGMOID") == "1":
        return jax.nn.sigmoid(x)
    return 0.5 * (jnp.tanh(0.5 * x) + 1.0)


def _silu(x):
    if os.environ.get("PALLAS_EXP_SIGMOID") == "1":
        return jax.nn.silu(x)
    return x * _sigmoid(x)


def _rep3_np(dtype=np.float32):
    """[3, 9] repeat selector: rep3[c, c*3+a] = 1 (c-major expansion)."""
    col = np.arange(9)[None, :]
    row = np.arange(3)[:, None]
    return (col // 3 == row).astype(dtype)


def pack_chain_weights(wd, wdf, wu):
    """Pack per-GCP weights into block-diagonal combined matrices.

    Returns (w_comb [G, 3V, 3H+27], wu_bd [G, 3H, 3V]) such that
      v_cm @ w_comb = [vh_x | vh_y | vh_z | vdfrep_x | vdfrep_y | vdfrep_z]
      vh_cm @ wu_bd = coords-major vector update
    — turning the per-coordinate small matmuls into single large ones.

    The vdf blocks carry the rep3 expansion FOLDED INTO THE WEIGHTS
    (wdf @ rep3, 9 columns per coordinate: column c*3+a holds vdf channel c
    for every frame axis a), so the kernel's scalarize is a pure VPU
    elementwise multiply against lane-tiled frames — no selector matmuls
    spend MXU tiles on 3->9 repeats.  The extra 18 columns ride inside the
    same 128-lane tile (3H+27 = 51 at the trained H = 8).
    """
    g, v_dim, h_dim = wd.shape
    w_comb = np.zeros((g, 3 * v_dim, 3 * h_dim + 27), dtype=np.float32)
    wu_bd = np.zeros((g, 3 * h_dim, 3 * v_dim), dtype=np.float32)
    wd_np = np.asarray(wd, np.float32)
    wdf_rep = np.asarray(wdf, np.float32) @ _rep3_np()  # [G, V, 9]
    wu_np = np.asarray(wu, np.float32)
    h3 = 3 * h_dim
    for k in range(3):
        w_comb[:, k * v_dim:(k + 1) * v_dim, k * h_dim:(k + 1) * h_dim] = wd_np
        w_comb[:, k * v_dim:(k + 1) * v_dim, h3 + 9 * k: h3 + 9 * (k + 1)] = wdf_rep
        wu_bd[:, k * h_dim:(k + 1) * h_dim, k * v_dim:(k + 1) * v_dim] = wu_np
    return w_comb, wu_bd


def _gcp2_chain_kernel(
    s_ref, v_ref, ft_ref,
    wcomb_ref, ws_ref, bs_ref, wubd_ref, wg_ref, bg_ref,
    wattn_ref, battn_ref,
    s_out_ref, v_out_ref,
    *, num_gcps: int, v_dim: int, hidden_dim: int, use_attention: bool,
):
    s = s_ref[...]
    v = v_ref[...]
    frames_t = ft_ref[...]  # [B, 9] layout k*3+a
    f32 = jnp.float32
    h3 = 3 * hidden_dim

    # tiled frame factors T_k[:, c*3+a] = frames[a, k], via a tile3 selector
    # matmul (3 tiny MXU ops per block, computed once and reused by every
    # chain stage — measured faster than a Mosaic lane-concat).  The matching
    # rep3 expansion of vdf is folded into w_comb's weights
    # (pack_chain_weights), so the per-stage scalarize is pure VPU.
    col = jax.lax.broadcasted_iota(jnp.int32, (3, 9), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (3, 9), 0)
    tile3 = (col % 3 == row).astype(f32)
    frame_tiles = [
        jnp.dot(frames_t[:, 3 * k: 3 * (k + 1)].astype(f32), tile3,
                preferred_element_type=f32)
        for k in range(3)
    ]

    for g in range(num_gcps):
        # one combined matmul: [vh_x|vh_y|vh_z|vdfrep_x|vdfrep_y|vdfrep_z]
        vhd = jnp.dot(v, wcomb_ref[g], preferred_element_type=f32)  # [B, 3H+27]
        vh_sq = sum(
            vhd[:, k * hidden_dim:(k + 1) * hidden_dim] ** 2 for k in range(3)
        )
        # safe_norm over coords (eps inside AND outside the sqrt, ops/geometry.py)
        vnorm = jnp.sqrt(vh_sq + 1e-8) + 1e-8  # [B, H]
        # scalarize: schid[:, c*3+a] = sum_k vdf_k[:, c] * frames[a, k]
        schid = sum(
            vhd[:, h3 + 9 * k: h3 + 9 * (k + 1)] * frame_tiles[k]
            for k in range(3)
        )  # [B, 9]

        merged = jnp.concatenate(
            [s.astype(f32), vnorm, schid], axis=-1
        ).astype(s.dtype)
        s2 = jnp.dot(merged, ws_ref[g], preferred_element_type=f32) + bs_ref[g].astype(f32)
        silu_s2 = _silu(s2).astype(s.dtype)
        gate = _sigmoid(
            jnp.dot(silu_s2, wg_ref[g], preferred_element_type=f32) + bg_ref[g].astype(f32)
        ).astype(s.dtype)

        vu = jnp.dot(vhd[:, :h3].astype(s.dtype), wubd_ref[g],
                     preferred_element_type=f32).astype(s.dtype)  # [B, 3V] coords-major
        gate3 = jnp.concatenate([gate, gate, gate], axis=-1)
        # residual accumulation (reference gcpnet.py:698-701)
        s = s + silu_s2
        v = v + vu * gate3

    if use_attention:
        attn = _sigmoid(
            jnp.dot(s, wattn_ref[...], preferred_element_type=f32) + battn_ref[...].astype(f32)
        ).astype(s.dtype)
        s = s * attn

    s_out_ref[...] = s
    v_out_ref[...] = v


def fused_gcp2_chain(
    s: jax.Array,  # [E, S]
    v: jax.Array,  # [E, 3*V] coords-major
    frames_t: jax.Array,  # [E, 9] coordinate-major (k*3+a)
    wd: jax.Array,  # [G, V, H]
    wdf: jax.Array,  # [G, V, 3]
    ws: jax.Array,  # [G, S+H+9, S]
    bs: jax.Array,  # [G, S]
    wu: jax.Array,  # [G, H, V]
    wg: jax.Array,  # [G, S, V]
    bg: jax.Array,  # [G, V]
    wattn: jax.Array,  # [S, 1]
    battn: jax.Array,  # [1]
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Run the residual GCP2 chain (+ scalar attention) over flat edges.

    NOTE: ``frames_t`` is the TRANSPOSED frame layout (coordinate-major,
    column k*3+a holds frame axis a's k-th coordinate).
    """
    e, s_dim = s.shape
    v_dim = wd.shape[1]
    hidden_dim = wd.shape[2]
    num_gcps = wd.shape[0]

    w_comb, wu_bd = pack_chain_weights(wd, wdf, wu)
    w_comb = jnp.asarray(w_comb, s.dtype)
    wu_bd = jnp.asarray(wu_bd, s.dtype)

    block = min(block, max(256, e))
    e_pad = ((e + block - 1) // block) * block
    if e_pad != e:
        pad = ((0, e_pad - e), (0, 0))
        s = jnp.pad(s, pad)
        v = jnp.pad(v, pad)
        frames_t = jnp.pad(frames_t, pad)

    grid = (e_pad // block,)

    def edge_spec(width):
        return pl.BlockSpec((block, width), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def full_spec(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _gcp2_chain_kernel,
        num_gcps=num_gcps,
        v_dim=v_dim,
        hidden_dim=hidden_dim,
        use_attention=True,
    )

    flops_per_edge = num_gcps * 2 * (
        3 * v_dim * hidden_dim + 3 * v_dim * 3 + (s_dim + hidden_dim + 9) * s_dim
        + s_dim * v_dim + 3 * hidden_dim * v_dim
    )
    cost = pl.CostEstimate(
        flops=flops_per_edge * e_pad,
        bytes_accessed=(s.size + v.size + frames_t.size) * 2 * s.dtype.itemsize,
        transcendentals=e_pad * s_dim * num_gcps * 2,
    )

    s_out, v_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            edge_spec(s_dim),
            edge_spec(3 * v_dim),
            edge_spec(9),
            full_spec(w_comb.shape),
            full_spec(ws.shape),
            full_spec(bs.shape),
            full_spec(wu_bd.shape),
            full_spec(wg.shape),
            full_spec(bg.shape),
            full_spec(wattn.shape),
            full_spec(battn.shape),
        ],
        out_specs=[edge_spec(s_dim), edge_spec(3 * v_dim)],
        out_shape=[
            jax.ShapeDtypeStruct((e_pad, s_dim), s.dtype),
            jax.ShapeDtypeStruct((e_pad, 3 * v_dim), v.dtype),
        ],
        cost_estimate=cost,
        interpret=interpret,
    )(s, v, frames_t, w_comb, ws, bs, wu_bd, wg, bg, wattn, battn)

    return s_out[:e], v_out[:e]


# ---------------------------------------------------------------------------
# Mega-kernel: one full message-passing layer (GCP1 + chain + attention +
# masked aggregation) per (molecule, source-row-block) grid cell.
#
# Measured design note: a variant batching several molecules per grid cell
# (shared matmuls + block-diagonal selectors) was tried and REGRESSED
# (12.2x vs 17.9x baseline): Mosaic's divisibility rules then force the
# node axis to pad to a multiple of 8 (19 -> 24 for the QM9 bench shapes,
# +60% edge compute), which outweighs the per-program overhead it saves.
# One-molecule 3D blocks are exempt from the rule (block == full dim).
#
# Motivation (measured on TPU v5e over this runtime): effective HBM copy
# bandwidth is ~150 GB/s, so every HBM materialization of edge tensors
# dominates the step — and narrow-minor-dim tensors ([E, 3, H], [E, 9]) pad
# to (sublane, 128) tiles, inflating traffic up to ~14x.  This kernel reads
# ONE packed 128-lane-wide edge tensor (built once per forward: embedded
# edge scalars | coords-major edge vectors | transposed frames | edge mask)
# plus the per-node features, and writes only the aggregated per-node
# messages.  All broadcasts (node -> edge) and the aggregation (edge ->
# node) are selector matmuls, so nothing narrow ever touches HBM.
# ---------------------------------------------------------------------------


def pack_gcp1_weights(w1: dict, s_dim: int, v_dim: int, ve_dim: int, dtype=np.float32):
    """Split + block-diagonalize the first message GCP's weights.

    Input: the flax subtree of message_fusion_0 (same params as GCP2 over
    the virtual concat [node_i | edge | node_j]).  Returns a dict of numpy
    arrays keyed for fused_message_layer.
    """
    wd = np.asarray(w1["vector_down"]["kernel"], dtype)      # [2V+Ve, H]
    wdf = np.asarray(w1["vector_down_frames"]["kernel"], dtype)  # [2V+Ve, 3]
    ws = np.asarray(w1["scalar_out_head"]["scalar_out"]["kernel"], dtype)
    bs = np.asarray(w1["scalar_out_head"]["scalar_out"]["bias"], dtype)
    wu = np.asarray(w1["vector_up"]["kernel"], dtype)        # [H, Vout]
    wg = np.asarray(w1["vector_out_scale"]["kernel"], dtype)
    bg = np.asarray(w1["vector_out_scale"]["bias"], dtype)

    h = wd.shape[1]
    v_out = wu.shape[1]

    def bd3(m):  # [a, b] -> [3a, 3b] block-diagonal
        a, b = m.shape
        out = np.zeros((3 * a, 3 * b), dtype)
        for k in range(3):
            out[k * a:(k + 1) * a, k * b:(k + 1) * b] = m
        return out

    wd_i, wd_e, wd_j = wd[:v_dim], wd[v_dim:v_dim + ve_dim], wd[v_dim + ve_dim:]
    # rep3 folded into the vdf blocks (see pack_chain_weights): [., 3] -> [., 9]
    rep = _rep3_np(dtype)
    wdf_i, wdf_e, wdf_j = (
        wdf[:v_dim] @ rep, wdf[v_dim:v_dim + ve_dim] @ rep, wdf[v_dim + ve_dim:] @ rep,
    )
    se_dim = ws.shape[0] - 2 * s_dim - h - 9

    return {
        # node-side vector projections ([3V] coords-major in, [3H+27] out)
        "wvi": np.concatenate([bd3(wd_i), bd3(wdf_i)], axis=1),
        "wvj": np.concatenate([bd3(wd_j), bd3(wdf_j)], axis=1),
        "wve": np.concatenate([bd3(wd_e), bd3(wdf_e)], axis=1),  # [3Ve, 3H+27]
        "wsi": ws[:s_dim],
        "wsj": ws[s_dim + se_dim: 2 * s_dim + se_dim],
        # one fused [Se+H+9, S] matmul for the edge-local s2 contributions
        # ([e_feat | vnorm | schid] concat): 3 narrow-K matmuls -> 1
        "wsx": np.concatenate([
            ws[s_dim: s_dim + se_dim],                            # wse
            ws[2 * s_dim + se_dim: 2 * s_dim + se_dim + h],       # wsvn
            ws[2 * s_dim + se_dim + h:],                          # wssc
        ], axis=0),
        "bs": bs,
        "wu_bd": bd3(wu)[: 3 * h],  # [3H, 3Vout]
        "wg": wg,
        "bg": bg,
        "hidden": h,
    }


def _chain_and_attn(
    s, v, ones_col, scalarize,
    wcomb_ref, wsc_ref, bsc_ref, wubd_ref, wgc_ref, bgc_ref,
    wattn_ref, battn_ref, emask,
    *, hc: int, num_gcps: int,
):
    """Residual GCP2 chain + scalar attention + edge mask, shared by both
    forward kernels.  VPU-lean form (the sampling kernel is VPU-bound,
    BASELINE.md roofline): biases ride as a ones-column through the merged
    matmul (saves a [rows, S] f32 add pass per stage), the merged concat
    stays in the compute dtype (no f32 up/down cast of the S-wide s block),
    and the attention and edge mask collapse to one [rows, 1] scale."""
    f32 = jnp.float32
    dt = s.dtype
    hc3 = 3 * hc
    for g in range(num_gcps):
        vhd_g = jnp.dot(v, wcomb_ref[g], preferred_element_type=f32)  # [rows, 3Hc+27]
        vh_sq = sum(vhd_g[:, k * hc:(k + 1) * hc] ** 2 for k in range(3))
        vnorm_g = jnp.sqrt(vh_sq + 1e-8) + 1e-8
        schid_g = scalarize(vhd_g[:, hc3:])
        merged = jnp.concatenate(
            [s, vnorm_g.astype(dt), schid_g.astype(dt), ones_col], axis=-1
        )
        # bias folded into the weight: one small sublane concat per cell
        # replaces a [rows, S] broadcast add per stage
        wsc_b = jnp.concatenate([wsc_ref[g], bsc_ref[g][None, :]], axis=0)
        s2_g = jnp.dot(merged, wsc_b, preferred_element_type=f32)
        silu_g = _silu(s2_g).astype(dt)
        gate_g = _sigmoid(
            jnp.dot(silu_g, wgc_ref[g], preferred_element_type=f32) + bgc_ref[g].astype(f32)
        ).astype(dt)
        vu_g = jnp.dot(vhd_g[:, :hc3].astype(dt), wubd_ref[g], preferred_element_type=f32).astype(dt)
        s = s + silu_g
        v = v + vu_g * jnp.concatenate([gate_g, gate_g, gate_g], axis=-1)

    attn = _sigmoid(
        jnp.dot(s, wattn_ref[...], preferred_element_type=f32) + battn_ref[...].astype(f32)
    )
    scale = (attn * emask.astype(f32)).astype(dt)  # [rows, 1]
    return s * scale, v * emask


def _message_layer_kernel(
    s_node_ref, v_node_ref, ep_ref, rsel_ref, tsel_ref,
    # GCP1 weights
    wvi_ref, wvj_ref, wve_ref, wsi_ref, wsj_ref, wsx_ref,
    bs1_ref, wu1_ref, wg1_ref, bg1_ref,
    # chain weights
    wcomb_ref, wsc_ref, bsc_ref, wubd_ref, wgc_ref, bgc_ref, wattn_ref, battn_ref,
    # outputs
    s_agg_ref, v_agg_ref,
    *, ti: int, n: int, s_dim: int, v_dim: int, ve_dim: int,
    h1: int, hc: int, num_gcps: int, mols: int = 1,
):
    f32 = jnp.float32
    dt = s_node_ref.dtype
    se = wsx_ref.shape[0] - h1 - 9

    # Multi-molecule fusion (mols > 1, whole-molecule tiles only): the
    # wrapper reshapes [B, N, .] -> [B/G, G*N, .] and [B, N*N, P] ->
    # [B/G, G*N*N, P], so one grid cell holds G molecules FLATTENED into
    # single big matmuls (M = G*N*N rows, selector K = G*N) — small
    # per-molecule matmul shapes were the measured bottleneck (~22% MXU
    # utilization at QM9 sizes), not per-cell overhead.  Row r of the cell
    # maps to source node r // N (already molecule-flattened) and to target
    # node (r // N**2)*N + r % N; the selectors encode exactly that, so
    # cross-molecule terms are never selected.
    s_n = s_node_ref[0]  # [G*N, S]
    v_n = v_node_ref[0]  # [G*N, 3V]
    ep = ep_ref[0]  # [G*TI*N, P]
    e_feat = ep[:, :se]
    xi = ep[:, se: se + 3 * ve_dim]
    ft = ep[:, se + 3 * ve_dim: se + 3 * ve_dim + 9]
    emask = ep[:, se + 3 * ve_dim + 9: se + 3 * ve_dim + 10]

    # source/target selectors R[r, a] = [r // N == a] (a over this tile's
    # source rows) and T[r, b] = [(r // N^2)*N + r % N == b] (b over
    # flattened nodes) are PRECOMPUTED by the wrapper — they're
    # tile-independent in every mode, so like the weights they're fetched
    # into VMEM once and reused by every grid cell.  Building them in-kernel
    # (iota + integer div + compare + cast per cell) measured ~6% of the
    # whole sampling call.
    R = rsel_ref[...]
    T = tsel_ref[...]

    t = pl.program_id(1)
    i0 = pl.multiple_of(t * ti, ti)
    s_i = s_node_ref[0, pl.ds(i0, ti), :] if ti != n else s_n
    v_i = v_node_ref[0, pl.ds(i0, ti), :] if ti != n else v_n

    # tiled frame factors via tile3 selector matmul (once per cell); the
    # rep3 expansion of vdf is folded into the packed weights, so the
    # per-stage scalarize is VPU-only
    col = jax.lax.broadcasted_iota(jnp.int32, (3, 9), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (3, 9), 0)
    tile3 = (col % 3 == row).astype(f32)
    ftiles = [
        jnp.dot(ft[:, 3 * k: 3 * (k + 1)].astype(f32), tile3,
                preferred_element_type=f32)
        for k in range(3)
    ]

    def scalarize(vdfrep_all):  # [rows, 27] (9 c-major cols per coordinate)
        return sum(
            vdfrep_all[:, 9 * k: 9 * (k + 1)] * ftiles[k] for k in range(3)
        )

    # ---- GCP1 over the virtual concat ----
    h3 = 3 * h1
    vhd = (
        jnp.dot(R, jnp.dot(v_i, wvi_ref[...], preferred_element_type=f32).astype(dt),
                preferred_element_type=f32)
        + jnp.dot(T, jnp.dot(v_n, wvj_ref[...], preferred_element_type=f32).astype(dt),
                  preferred_element_type=f32)
        + jnp.dot(xi, wve_ref[...], preferred_element_type=f32)
    )  # [rows, 3H1+27]
    vh_sq = sum(vhd[:, k * h1:(k + 1) * h1] ** 2 for k in range(3))
    vnorm = jnp.sqrt(vh_sq + 1e-8) + 1e-8
    schid = scalarize(vhd[:, h3:])

    ones_col = jnp.ones((ep.shape[0], 1), dt)
    # edge-local s2 contributions as ONE fused matmul over the
    # [e_feat | vnorm | schid | 1] concat (wsx_b = [wse; wsvn; wssc; bs] —
    # the bias rides the ones column instead of a [rows, S] add pass)
    cat1 = jnp.concatenate(
        [e_feat, vnorm.astype(dt), schid.astype(dt), ones_col], axis=-1
    )
    wsx_b = jnp.concatenate([wsx_ref[...], bs1_ref[...].reshape(1, -1)], axis=0)
    s2 = (
        jnp.dot(R, jnp.dot(s_i, wsi_ref[...],
                           preferred_element_type=f32).astype(dt), preferred_element_type=f32)
        + jnp.dot(T, jnp.dot(s_n, wsj_ref[...], preferred_element_type=f32).astype(dt),
                  preferred_element_type=f32)
        + jnp.dot(cat1, wsx_b, preferred_element_type=f32)
    )
    silu1 = _silu(s2).astype(dt)
    gate1 = _sigmoid(
        jnp.dot(silu1, wg1_ref[...], preferred_element_type=f32) + bg1_ref[...].astype(f32)
    ).astype(dt)
    vu1 = jnp.dot(vhd[:, :h3].astype(dt), wu1_ref[...], preferred_element_type=f32).astype(dt)
    g3 = jnp.concatenate([gate1, gate1, gate1], axis=-1)

    # ---- residual chain of secondary GCPs + attention + mask ----
    s, v = _chain_and_attn(
        silu1, vu1 * g3, ones_col, scalarize,
        wcomb_ref, wsc_ref, bsc_ref, wubd_ref, wgc_ref, bgc_ref,
        wattn_ref, battn_ref, emask,
        hc=hc, num_gcps=num_gcps,
    )

    # ---- masked aggregation over targets j: R^T @ messages ----
    s_agg_ref[0] = jnp.dot(R.T, s, preferred_element_type=f32).astype(dt)
    v_agg_ref[0] = jnp.dot(R.T, v, preferred_element_type=f32).astype(dt)


def _message_layer_kernel_wm(
    nodeproj_ref, ep_ref, rsel_ref, rtsel_ref,
    # GCP1 weights (node-side projections are precomputed by the wrapper)
    wve_ref, wsx_ref, bs1_ref, wu1_ref, wg1_ref, bg1_ref,
    # chain weights
    wcomb_ref, wsc_ref, bsc_ref, wubd_ref, wgc_ref, bgc_ref, wattn_ref, battn_ref,
    # outputs
    s_agg_ref, v_agg_ref,
    *, n: int, s_dim: int, v_dim: int, ve_dim: int,
    h1: int, hc: int, num_gcps: int, mols: int, scales_ref=None,
):
    """Whole-molecule-cell forward, VPU-lean restructuring of
    _message_layer_kernel (the sampling kernel is VPU-bound — BASELINE.md
    roofline; every eliminated [rows, S] elementwise pass counts):

      * node-side projections (s@wsi, s@wsj, v@wvi, v@wvj) move OUT of the
        kernel (wrapper XLA, O(B N S^2) vs the kernel's O(B N^2 S^2)), and
        their four selector dots + three [rows, .] f32 adds collapse into
        ONE [R | T] @ [proj_i; proj_j] matmul whose accumulation happens on
        the MXU (which has slack) instead of VPU add passes;
      * the layout puts the S-wide s2 block first, so rt_out[:, :S] and
        rt_out[:, S:] split on a 128-lane boundary at the trained S=256;
      * GCP1 bias rides a ones-column (shared with the chain stages).
    """
    f32 = jnp.float32
    dt = nodeproj_ref.dtype
    se = wsx_ref.shape[0] - h1 - 9
    h3 = 3 * h1

    ep = ep_ref[0]  # [rows, P]
    if scales_ref is not None:
        # int8-quantized epack (PALLAS_EPACK_INT8 experiment): halves the
        # per-layer HBM fetch at the cost of one dequant pass per cell
        ep = ep.astype(f32) * scales_ref[...]
        ep = ep.astype(dt)
    e_feat = ep[:, :se]
    xi = ep[:, se: se + 3 * ve_dim]
    ft = ep[:, se + 3 * ve_dim: se + 3 * ve_dim + 9]
    emask = ep[:, se + 3 * ve_dim + 9: se + 3 * ve_dim + 10]

    R = rsel_ref[...]      # [rows, NN] (aggregation)
    RT = rtsel_ref[...]    # [rows, 2NN] ([R | T], wrapper-precomputed)

    col = jax.lax.broadcasted_iota(jnp.int32, (3, 9), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (3, 9), 0)
    tile3 = (col % 3 == row).astype(f32)
    ftiles = [
        jnp.dot(ft[:, 3 * k: 3 * (k + 1)].astype(f32), tile3,
                preferred_element_type=f32)
        for k in range(3)
    ]

    def scalarize(vdfrep_all):  # [rows, 27] (9 c-major cols per coordinate)
        return sum(
            vdfrep_all[:, 9 * k: 9 * (k + 1)] * ftiles[k] for k in range(3)
        )

    # ---- GCP1: one merged selector matmul for all node-side terms ----
    rt_out = jnp.dot(RT, nodeproj_ref[0], preferred_element_type=f32)  # [rows, S+3H1+27]
    vhd = rt_out[:, s_dim:] + jnp.dot(xi, wve_ref[...], preferred_element_type=f32)
    vh_sq = sum(vhd[:, k * h1:(k + 1) * h1] ** 2 for k in range(3))
    vnorm = jnp.sqrt(vh_sq + 1e-8) + 1e-8
    schid = scalarize(vhd[:, h3:])

    ones_col = jnp.ones((ep.shape[0], 1), dt)
    cat1 = jnp.concatenate(
        [e_feat, vnorm.astype(dt), schid.astype(dt), ones_col], axis=-1
    )
    wsx_b = jnp.concatenate([wsx_ref[...], bs1_ref[...].reshape(1, -1)], axis=0)
    s2 = rt_out[:, :s_dim] + jnp.dot(cat1, wsx_b, preferred_element_type=f32)
    silu1 = _silu(s2).astype(dt)
    gate1 = _sigmoid(
        jnp.dot(silu1, wg1_ref[...], preferred_element_type=f32) + bg1_ref[...].astype(f32)
    ).astype(dt)
    vu1 = jnp.dot(vhd[:, :h3].astype(dt), wu1_ref[...], preferred_element_type=f32).astype(dt)
    g3 = jnp.concatenate([gate1, gate1, gate1], axis=-1)

    s, v = _chain_and_attn(
        silu1, vu1 * g3, ones_col, scalarize,
        wcomb_ref, wsc_ref, bsc_ref, wubd_ref, wgc_ref, bgc_ref,
        wattn_ref, battn_ref, emask,
        hc=hc, num_gcps=num_gcps,
    )

    # ---- masked aggregation over targets j: R^T @ messages ----
    f32_agg = jnp.float32
    s_agg_ref[0] = jnp.dot(R.T, s, preferred_element_type=f32_agg).astype(dt)
    v_agg_ref[0] = jnp.dot(R.T, v, preferred_element_type=f32_agg).astype(dt)


def fused_message_layer(
    s_node: jax.Array,  # [B, N, S]
    v_node: jax.Array,  # [B, N, 3V] coords-major
    epack: jax.Array,  # [B, N*N, P] packed [e | xi_cm | frames_t | mask | pad]
    gcp1_w: dict,  # from pack_gcp1_weights (jnp arrays)
    chain_w: tuple,  # (w_comb, ws, bs, wu_bd, wg, bg, wattn, battn)
    ve_dim: int,
    ti: Optional[int] = None,
    interpret: bool = False,
    epack_scales: Optional[jax.Array] = None,  # [P] f32: epack is int8-quantized
) -> Tuple[jax.Array, jax.Array]:
    """One full message-passing layer -> aggregated node updates.

    Returns (s_agg [B, N, S], v_agg [B, N, 3V]).
    """
    b, n, s_dim = s_node.shape
    v3 = v_node.shape[-1]
    v_dim = v3 // 3
    p = epack.shape[-1]
    # h1 from shapes (not a dict entry) so gcp1_w can be a traced pytree in
    # the trainable path (models/gcpnet_fast.py make_message_layer_fn)
    h1 = gcp1_w["wu_bd"].shape[0] // 3
    w_comb, wsc, bsc, wu_bd, wgc, bgc, wattn, battn = chain_w
    hc = (w_comb.shape[2] - 27) // 3
    num_gcps = w_comb.shape[0]

    if ti is None:
        ti = select_tile(n)
    assert n % ti == 0, (
        f"N={n} has no legal tile TI={ti}; pad N to a multiple of 8 for large molecules"
    )
    assert epack_scales is None or ti == n, (
        "int8 epack is only supported on whole-molecule cells"
    )

    # molecules fused per grid cell (whole-molecule tiles only): one cell
    # runs ONE set of big matmuls over G flattened molecules — small
    # per-molecule matmul shapes were the measured bottleneck (~22% MXU
    # utilization at QM9 sizes); fusion grows every MXU dim with no padding
    mols = select_fusion(b, n) if ti == n else 1

    if mols > 1:
        s_node = s_node.reshape(b // mols, mols * n, s_dim)
        v_node = v_node.reshape(b // mols, mols * n, v3)
        epack = epack.reshape(b // mols, mols * n * n, p)

    # precomputed selectors (see kernel comment): tile-independent, loaded
    # once into VMEM.  XLA constant-folds them per compiled shape.
    rows_cell = mols * ti * n
    r1 = jnp.arange(rows_cell, dtype=jnp.int32)[:, None]
    rsel = (r1 // n == jnp.arange(mols * ti, dtype=jnp.int32)[None, :]
            ).astype(s_node.dtype)
    tsel = ((r1 // (n * n)) * n + r1 % n
            == jnp.arange(mols * n, dtype=jnp.int32)[None, :]).astype(s_node.dtype)

    flops = b * n * n * 2 * (
        (2 * s_dim + p + h1 + 9) * s_dim + num_gcps * (s_dim + hc + 9) * s_dim
        + (num_gcps + 1) * (s_dim * v_dim + 3 * hc * v_dim)
        + 2 * ti * (s_dim + v3)
    )
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=int(epack.size * epack.dtype.itemsize * 1.1),
        transcendentals=b * n * n * s_dim * (num_gcps + 1) * 2,
    )
    g1 = gcp1_w
    chain_args = [w_comb, wsc, bsc, wu_bd, wgc, bgc, wattn, battn]

    if ti == n:
        # whole-molecule cells: merged-selector kernel.  Node-side
        # projections run in XLA here (once per layer call, O(B N S^2));
        # the kernel consumes them through ONE [R | T] selector matmul.
        f32 = jnp.float32
        dt = s_node.dtype
        sp_i = jnp.dot(s_node, g1["wsi"], preferred_element_type=f32).astype(dt)
        sp_j = jnp.dot(s_node, g1["wsj"], preferred_element_type=f32).astype(dt)
        vp_i = jnp.dot(v_node, g1["wvi"], preferred_element_type=f32).astype(dt)
        vp_j = jnp.dot(v_node, g1["wvj"], preferred_element_type=f32).astype(dt)
        # s2 block first: rt_out splits at lane s_dim (128-aligned at the
        # trained S=256)
        nodeproj = jnp.concatenate([
            jnp.concatenate([sp_i, vp_i], axis=-1),
            jnp.concatenate([sp_j, vp_j], axis=-1),
        ], axis=1)  # [B/G, 2*G*N, S + 3H1+27]
        rtsel = jnp.concatenate([rsel, tsel], axis=1)

        grid = (b // mols,)
        pj = nodeproj.shape[-1]

        def nspec1(width):
            return pl.BlockSpec((1, mols * n, width), lambda bb: (bb, 0, 0),
                                memory_space=pltpu.VMEM)

        def pspec():
            return pl.BlockSpec((1, 2 * mols * n, pj), lambda bb: (bb, 0, 0),
                                memory_space=pltpu.VMEM)

        def espec1():
            return pl.BlockSpec((1, mols * n * n, p), lambda bb: (bb, 0, 0),
                                memory_space=pltpu.VMEM)

        def full_spec1(arr):
            return pl.BlockSpec(arr.shape, lambda bb: tuple(0 for _ in arr.shape),
                                memory_space=pltpu.VMEM)

        weight_args = [g1["wve"], g1["wsx"], g1["bs"], g1["wu_bd"], g1["wg"],
                       g1["bg"]] + chain_args
        if epack_scales is not None:
            def kernel(nodeproj_ref, ep_ref, scales_ref, rsel_ref, rtsel_ref,
                       *wrefs):
                return _message_layer_kernel_wm(
                    nodeproj_ref, ep_ref, rsel_ref, rtsel_ref, *wrefs,
                    n=n, s_dim=s_dim, v_dim=v_dim, ve_dim=ve_dim,
                    h1=h1, hc=hc, num_gcps=num_gcps, mols=mols,
                    scales_ref=scales_ref,
                )
            extra_in = [full_spec1(epack_scales)]
            extra_args = [epack_scales]
        else:
            kernel = functools.partial(
                _message_layer_kernel_wm,
                n=n, s_dim=s_dim, v_dim=v_dim, ve_dim=ve_dim,
                h1=h1, hc=hc, num_gcps=num_gcps, mols=mols,
            )
            extra_in, extra_args = [], []
        in_specs = [pspec(), espec1()] + extra_in + [
            full_spec1(rsel), full_spec1(rtsel)
        ] + [full_spec1(w) for w in weight_args]
        args = [nodeproj, epack] + extra_args + [rsel, rtsel] + weight_args
        s_agg, v_agg = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=[nspec1(s_dim), nspec1(v3)],
            out_shape=[
                jax.ShapeDtypeStruct((b // mols, mols * n, s_dim), s_node.dtype),
                jax.ShapeDtypeStruct((b // mols, mols * n, v3), v_node.dtype),
            ],
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(*args)

        if mols > 1:
            s_agg = s_agg.reshape(b, n, s_dim)
            v_agg = v_agg.reshape(b, n, v3)
        return s_agg, v_agg

    grid = (b // mols, n // ti)

    def nspec(width):
        return pl.BlockSpec((1, mols * n, width), lambda bb, tt: (bb, 0, 0),
                            memory_space=pltpu.VMEM)

    def espec():
        return pl.BlockSpec((1, mols * ti * n, p), lambda bb, tt: (bb, tt, 0),
                            memory_space=pltpu.VMEM)

    def ospec(width):
        return pl.BlockSpec((1, mols * ti, width), lambda bb, tt: (bb, tt, 0),
                            memory_space=pltpu.VMEM)

    def full_spec(arr):
        return pl.BlockSpec(arr.shape, lambda bb, tt: tuple(0 for _ in arr.shape),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _message_layer_kernel,
        ti=ti, n=n, s_dim=s_dim, v_dim=v_dim, ve_dim=ve_dim,
        h1=h1, hc=hc, num_gcps=num_gcps, mols=mols,
    )

    weight_args = [
        g1["wvi"], g1["wvj"], g1["wve"], g1["wsi"], g1["wsj"], g1["wsx"],
        g1["bs"], g1["wu_bd"], g1["wg"], g1["bg"],
    ] + chain_args

    s_agg, v_agg = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[nspec(s_dim), nspec(v3), espec(), full_spec(rsel),
                  full_spec(tsel)] + [full_spec(w) for w in weight_args],
        out_specs=[ospec(s_dim), ospec(v3)],
        out_shape=[
            jax.ShapeDtypeStruct((b // mols, mols * n, s_dim), s_node.dtype),
            jax.ShapeDtypeStruct((b // mols, mols * n, v3), v_node.dtype),
        ],
        cost_estimate=cost,
        # sub-tiled GEOM-scale cells (ti < n, rows ~2300) sit just above the
        # conservative 16 MiB default scoped-vmem limit on v5e
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(s_node, v_node, epack, rsel, tsel, *weight_args)

    if mols > 1:
        s_agg = s_agg.reshape(b, n, s_dim)
        v_agg = v_agg.reshape(b, n, v3)
    return s_agg, v_agg


# ---------------------------------------------------------------------------
# Handwritten backward kernel for the mega message layer.
#
# The packed-layout XLA AD backward is matmul-efficient but pays HBM traffic
# for every saved edge-space residual (~4 x [E, 256]-scale tensors per layer
# per direction).  This kernel recomputes the forward per cell in VMEM
# (keeping the per-stage residual states AND stage internals VMEM-resident
# for the reverse loop — one forward recompute total, not two) and emits
# input + weight gradients in one pass: weight grads accumulate across the
# sequential grid into constant-index output blocks (f32).
#
# Covers whole-molecule cells (ti == n, with molecule fusion) and the
# sub-molecule tiling for giant molecules (n % 8 == 0); AD fallback through
# message_layer_reference remains only for illegal node counts
# (gcpnet_fast.py make_message_layer_fn).
# ---------------------------------------------------------------------------


def _silu_grad(x_f32, sig):
    # d/dx [x * sigmoid(x)] = sig * (1 + x * (1 - sig))
    return sig * (1.0 + x_f32 * (1.0 - sig))


def _message_layer_bwd_kernel(
    s_node_ref, v_node_ref, ep_ref, ds_agg_ref, dv_agg_ref, rsel_ref, tsel_ref,
    # GCP1 weights
    wvi_ref, wvj_ref, wve_ref, wsi_ref, wsj_ref, wsx_ref,
    bs1_ref, wu1_ref, wg1_ref, bg1_ref,
    # chain weights
    wcomb_ref, wsc_ref, bsc_ref, wubd_ref, wgc_ref, bgc_ref, wattn_ref, battn_ref,
    # outputs: input grads (per cell)
    dsn_ref, dvn_ref, dep_ref,
    # outputs: weight grads (accumulated across the grid, f32)
    dwvi_ref, dwvj_ref, dwve_ref, dwsi_ref, dwsj_ref, dwsx_ref,
    dbs1_ref, dwu1_ref, dwg1_ref, dbg1_ref,
    dwcomb_ref, dwsc_ref, dbsc_ref, dwubd_ref, dwgc_ref, dbgc_ref,
    dwattn_ref, dbattn_ref,
    *, ti: int, n: int, s_dim: int, v_dim: int, ve_dim: int,
    h1: int, hc: int, num_gcps: int, mols: int, sel_r: bool,
):
    f32 = jnp.float32
    dt = s_node_ref.dtype
    se = wsx_ref.shape[0] - h1 - 9
    rows = mols * ti * n
    nn = mols * n
    v3 = 3 * v_dim
    h3 = 3 * h1
    hc3 = 3 * hc
    p = ep_ref.shape[-1]

    t = pl.program_id(1)
    first_tile = t == 0
    first = jnp.logical_and(pl.program_id(0) == 0, first_tile)
    i0 = pl.multiple_of(t * ti, ti)

    @pl.when(first)
    def _init_weight_grads():
        for ref in (dwvi_ref, dwvj_ref, dwve_ref, dwsi_ref, dwsj_ref, dwsx_ref,
                    dbs1_ref, dwu1_ref, dwg1_ref, dbg1_ref,
                    dwcomb_ref, dwsc_ref, dbsc_ref, dwubd_ref, dwgc_ref, dbgc_ref,
                    dwattn_ref, dbattn_ref):
            ref[...] = jnp.zeros_like(ref)

    # d_s_node / d_v_node accumulate target-side contributions from EVERY
    # source tile: zero them on the first tile of each molecule cell
    @pl.when(first_tile)
    def _init_node_grads():
        dsn_ref[...] = jnp.zeros_like(dsn_ref)
        dvn_ref[...] = jnp.zeros_like(dvn_ref)

    s_n = s_node_ref[0]  # [NN, S]
    v_n = v_node_ref[0]  # [NN, 3V]
    ep = ep_ref[0]  # [ROWS, P] (this tile's edge rows)
    e_feat = ep[:, :se]
    xi = ep[:, se: se + 3 * ve_dim]
    ft = ep[:, se + 3 * ve_dim: se + 3 * ve_dim + 9]
    emask = ep[:, se + 3 * ve_dim + 9: se + 3 * ve_dim + 10].astype(f32)

    # selectors (f32 for grad matmuls).  Row r of this tile maps to GLOBAL
    # source node i0 + r // N (sub-molecule tiling; for fused whole-molecule
    # cells ti == n, i0 == 0 and r // n is the flattened molecule-node index)
    # and to target node (r // N^2)*N + r % N.  T is tile-independent and
    # always precomputed by the wrapper (fetched into VMEM once); R is
    # precomputed for whole-molecule cells (sel_r) and built in-kernel only
    # for sub-tiled cells, where it depends on the source-tile offset i0.
    Tdt = tsel_ref[...]
    T = Tdt.astype(f32)
    if sel_r:
        Rdt = rsel_ref[...]
        R = Rdt.astype(f32)
    else:
        r_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, nn), 0)
        a_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, nn), 1)
        R = (r_idx // n + i0 == a_idx).astype(f32)
        Rdt = R.astype(dt)

    # tiled frame factors via tile3 selector matmul (once per cell); rep3 is
    # folded into the packed vdf weights so the per-stage scalarize fwd AND
    # bwd are pure VPU elementwise
    tcol = jax.lax.broadcasted_iota(jnp.int32, (3, 9), 1)
    trow = jax.lax.broadcasted_iota(jnp.int32, (3, 9), 0)
    tile3 = (tcol % 3 == trow).astype(f32)
    ftiles = [
        jnp.dot(ft[:, 3 * k: 3 * (k + 1)].astype(f32), tile3,
                preferred_element_type=f32)
        for k in range(3)
    ]

    def scalarize_fwd(vdfrep_all):  # [rows, 27] (9 c-major cols per coord)
        return sum(
            vdfrep_all[:, 9 * k: 9 * (k + 1)] * ftiles[k] for k in range(3)
        )

    # ---- forward recompute, storing stage states ----
    vhd1 = (
        jnp.dot(Rdt, jnp.dot(v_n, wvi_ref[...], preferred_element_type=f32).astype(dt),
                preferred_element_type=f32)
        + jnp.dot(Tdt, jnp.dot(v_n, wvj_ref[...], preferred_element_type=f32).astype(dt),
                  preferred_element_type=f32)
        + jnp.dot(xi, wve_ref[...], preferred_element_type=f32)
    )  # [rows, 3H1+27] f32
    q1 = sum(vhd1[:, k * h1:(k + 1) * h1] ** 2 for k in range(3))
    root1 = jnp.sqrt(q1 + 1e-8)
    vnorm1 = root1 + 1e-8
    schid1 = scalarize_fwd(vhd1[:, h3:])
    # edge-local s2 terms as one fused matmul (wsx = [wse; wsvn; wssc]);
    # cat1 is kept (f32) for the wsx weight grad
    cat1 = jnp.concatenate([e_feat.astype(f32), vnorm1, schid1], axis=-1)
    s2_1 = (
        jnp.dot(Rdt, jnp.dot(s_n, wsi_ref[...], preferred_element_type=f32).astype(dt),
                preferred_element_type=f32)
        + jnp.dot(Tdt, jnp.dot(s_n, wsj_ref[...], preferred_element_type=f32).astype(dt),
                  preferred_element_type=f32)
        + jnp.dot(cat1.astype(dt), wsx_ref[...], preferred_element_type=f32)
        + bs1_ref[...].astype(f32)
    )
    sig1 = _sigmoid(s2_1)
    silu1 = (s2_1 * sig1).astype(dt)
    zg1 = jnp.dot(silu1, wg1_ref[...], preferred_element_type=f32) + bg1_ref[...].astype(f32)
    gate1 = _sigmoid(zg1)
    gate1_dt = gate1.astype(dt)
    vu1 = jnp.dot(vhd1[:, :h3].astype(dt), wu1_ref[...], preferred_element_type=f32).astype(dt)
    g3_1 = jnp.concatenate([gate1_dt] * 3, axis=-1)

    s_stages = [silu1]
    v_stages = [vu1 * g3_1]
    # per-stage internals kept VMEM-resident for the reverse loop: before
    # round 5 the reverse loop RECOMPUTED vhd/merged/s2/sig/gate/vu per
    # stage — a second full chain forward (4 matmuls + 2 transcendental
    # passes per stage) inside every backward call.  Caching costs ~7 MB of
    # VMEM per stage at QM9 cell shapes (rows<=2048) and nothing in HBM;
    # the cached f32 values are bit-identical to what the reverse loop
    # used to recompute.
    stage_cache = []
    for g in range(num_gcps):
        s_g, v_g = s_stages[-1], v_stages[-1]
        vhd_g = jnp.dot(v_g, wcomb_ref[g], preferred_element_type=f32)
        q_g = sum(vhd_g[:, k * hc:(k + 1) * hc] ** 2 for k in range(3))
        root_g = jnp.sqrt(q_g + 1e-8)
        vnorm_g = root_g + 1e-8
        schid_g = scalarize_fwd(vhd_g[:, hc3:])
        merged = jnp.concatenate(
            [s_g.astype(f32), vnorm_g, schid_g], axis=-1
        ).astype(dt)
        s2_g = jnp.dot(merged, wsc_ref[g], preferred_element_type=f32) + bsc_ref[g].astype(f32)
        sig_g = _sigmoid(s2_g)
        silu_g = (s2_g * sig_g).astype(dt)
        gate_f32 = _sigmoid(
            jnp.dot(silu_g, wgc_ref[g], preferred_element_type=f32) + bgc_ref[g].astype(f32)
        )
        vu_f32 = jnp.dot(vhd_g[:, :hc3].astype(dt), wubd_ref[g], preferred_element_type=f32)
        stage_cache.append(
            (vhd_g, root_g, merged, s2_g, sig_g, silu_g, gate_f32, vu_f32)
        )
        s_stages.append(s_g + silu_g)
        v_stages.append(
            v_g + vu_f32.astype(dt) * jnp.concatenate([gate_f32.astype(dt)] * 3, axis=-1)
        )

    s_fin = s_stages[-1]  # [rows, S] pre-attention
    v_fin = v_stages[-1]
    z_attn = jnp.dot(s_fin, wattn_ref[...], preferred_element_type=f32) + battn_ref[...].astype(f32)
    attn = _sigmoid(z_attn)  # [rows, 1] f32

    # ---- backward ----
    ds_agg = ds_agg_ref[0].astype(f32)  # [NN, S]
    dv_agg = dv_agg_ref[0].astype(f32)  # [NN, 3V]
    d_s_out = jnp.dot(R, ds_agg, preferred_element_type=f32)  # [rows, S]
    d_v_out = jnp.dot(R, dv_agg, preferred_element_type=f32)  # [rows, 3V]

    s_fin32 = s_fin.astype(f32)
    v_fin32 = v_fin.astype(f32)
    ds = d_s_out * attn * emask
    d_attn = jnp.sum(d_s_out * s_fin32 * emask, axis=1, keepdims=True)
    dv = d_v_out * emask
    d_emask = (
        jnp.sum(d_s_out * s_fin32 * attn, axis=1, keepdims=True)
        + jnp.sum(d_v_out * v_fin32, axis=1, keepdims=True)
    )
    d_z_attn = d_attn * attn * (1.0 - attn)
    dwattn_ref[...] += jnp.dot(s_fin32.T, d_z_attn, preferred_element_type=f32)
    dbattn_ref[...] += jnp.sum(d_z_attn, axis=0, keepdims=True)
    ds = ds + jnp.dot(d_z_attn, wattn_ref[...].astype(f32).T, preferred_element_type=f32)

    d_ft = jnp.zeros((rows, 9), f32)

    def norm_schid_bwd(vhd_g, d_vnorm, d_schid, root, hdim, d_lin):
        """Backward of vnorm + scalarize (+ the vu linear path d_lin into the
        first 3h columns), returning d_vhd [rows, 3h+27] and the d_ft
        contribution [rows, 9] (k-major, matching the ft layout).  With rep3
        folded into the weights this is pure VPU: d_vdfrep_k = d_schid *
        ftile_k; d_ft[:, 3k+a] = sum_c (d_schid * vdfrep_k)[:, c*3+a]."""
        hh3 = 3 * hdim
        d_q = d_vnorm * (0.5 / root)
        d_vh = jnp.concatenate(
            [2.0 * vhd_g[:, k * hdim:(k + 1) * hdim] * d_q for k in range(3)], axis=1
        ) + d_lin
        d_vdfrep_parts = []
        d_ft_parts = []
        for k in range(3):
            vdfrep_k = vhd_g[:, hh3 + 9 * k: hh3 + 9 * (k + 1)]
            d_vdfrep_parts.append(d_schid * ftiles[k])
            # d_ft[:, 3k+a] = sum_c (d_schid * vdfrep_k)[:, c*3+a] — the
            # 9->3 fold as one tiny MXU op (tile3.T), not misaligned slices
            d_ft_parts.append(
                jnp.dot(d_schid * vdfrep_k, tile3.T, preferred_element_type=f32)
            )
        d_vhd = jnp.concatenate([d_vh] + d_vdfrep_parts, axis=1)
        return d_vhd, jnp.concatenate(d_ft_parts, axis=1)

    # chain stages in reverse — stage internals come from the VMEM cache
    # built during the forward recompute above (gate_g/vu_g are the f32
    # pre-cast values, exactly what this loop used to recompute)
    for g in reversed(range(num_gcps)):
        s_in, v_in = s_stages[g], v_stages[g]
        vhd_g, root_g, merged, s2_g, sig_g, silu_g, gate_g, vu_g = stage_cache[g]

        gate3 = jnp.concatenate([gate_g] * 3, axis=-1)
        d_silu = ds
        d_vu = dv * gate3
        d_gate = sum(
            dv[:, k * v_dim:(k + 1) * v_dim] * vu_g[:, k * v_dim:(k + 1) * v_dim]
            for k in range(3)
        )
        d_zg = d_gate * gate_g * (1.0 - gate_g)
        silu_g32 = silu_g.astype(f32)
        dwgc_ref[g] += jnp.dot(silu_g32.T, d_zg, preferred_element_type=f32)
        dbgc_ref[g:g + 1] += jnp.sum(d_zg, axis=0, keepdims=True)
        d_silu = d_silu + jnp.dot(d_zg, wgc_ref[g].astype(f32).T, preferred_element_type=f32)
        d_s2 = d_silu * _silu_grad(s2_g, sig_g)
        merged32 = merged.astype(f32)
        dwsc_ref[g] += jnp.dot(merged32.T, d_s2, preferred_element_type=f32)
        dbsc_ref[g:g + 1] += jnp.sum(d_s2, axis=0, keepdims=True)
        d_merged = jnp.dot(d_s2, wsc_ref[g].astype(f32).T, preferred_element_type=f32)
        d_s_in = ds + d_merged[:, :s_dim]
        d_vnorm = d_merged[:, s_dim:s_dim + hc]
        d_schid = d_merged[:, s_dim + hc:]
        # vu path into vhd
        dwubd_ref[g] += jnp.dot(vhd_g[:, :hc3].astype(f32).T, d_vu, preferred_element_type=f32)
        d_vhd_lin = jnp.dot(d_vu, wubd_ref[g].astype(f32).T, preferred_element_type=f32)
        d_vhd, d_ft_loc = norm_schid_bwd(vhd_g, d_vnorm, d_schid, root_g, hc, d_vhd_lin)
        d_ft = d_ft + d_ft_loc
        dwcomb_ref[g] += jnp.dot(v_in.astype(f32).T, d_vhd, preferred_element_type=f32)
        d_v_in = dv + jnp.dot(d_vhd, wcomb_ref[g].astype(f32).T, preferred_element_type=f32)
        ds, dv = d_s_in, d_v_in

    # ---- GCP1 backward ----
    d_silu1 = ds
    d_vu1 = dv * g3_1.astype(f32)
    vu1_32 = vu1.astype(f32)
    d_gate1 = sum(
        dv[:, k * v_dim:(k + 1) * v_dim] * vu1_32[:, k * v_dim:(k + 1) * v_dim]
        for k in range(3)
    )
    d_zg1 = d_gate1 * gate1 * (1.0 - gate1)
    silu1_32 = silu1.astype(f32)
    dwg1_ref[...] += jnp.dot(silu1_32.T, d_zg1, preferred_element_type=f32)
    dbg1_ref[...] += jnp.sum(d_zg1, axis=0, keepdims=True)
    d_silu1 = d_silu1 + jnp.dot(d_zg1, wg1_ref[...].astype(f32).T, preferred_element_type=f32)
    d_s2 = d_silu1 * _silu_grad(s2_1, sig1)

    dbs1_ref[...] += jnp.sum(d_s2, axis=0, keepdims=True)
    rt_ds2 = jnp.dot(R.T, d_s2, preferred_element_type=f32)  # [NN, S]
    tt_ds2 = jnp.dot(T.T, d_s2, preferred_element_type=f32)
    s_n32 = s_n.astype(f32)
    dwsi_ref[...] += jnp.dot(s_n32.T, rt_ds2, preferred_element_type=f32)
    dwsj_ref[...] += jnp.dot(s_n32.T, tt_ds2, preferred_element_type=f32)
    d_s_node = (
        jnp.dot(rt_ds2, wsi_ref[...].astype(f32).T, preferred_element_type=f32)
        + jnp.dot(tt_ds2, wsj_ref[...].astype(f32).T, preferred_element_type=f32)
    )
    d_cat1 = jnp.dot(d_s2, wsx_ref[...].astype(f32).T, preferred_element_type=f32)
    d_e = d_cat1[:, :se]
    d_vnorm1 = d_cat1[:, se: se + h1]
    d_schid1 = d_cat1[:, se + h1:]
    dwsx_ref[...] += jnp.dot(cat1.T, d_s2, preferred_element_type=f32)

    dwu1_ref[...] += jnp.dot(vhd1[:, :h3].T, d_vu1, preferred_element_type=f32)
    d_vhd_lin1 = jnp.dot(d_vu1, wu1_ref[...].astype(f32).T, preferred_element_type=f32)
    d_vhd1, d_ft_loc1 = norm_schid_bwd(vhd1, d_vnorm1, d_schid1, root1, h1, d_vhd_lin1)
    d_ft = d_ft + d_ft_loc1

    rt_dvhd = jnp.dot(R.T, d_vhd1, preferred_element_type=f32)  # [NN, 3H1+9]
    tt_dvhd = jnp.dot(T.T, d_vhd1, preferred_element_type=f32)
    v_n32 = v_n.astype(f32)
    dwvi_ref[...] += jnp.dot(v_n32.T, rt_dvhd, preferred_element_type=f32)
    dwvj_ref[...] += jnp.dot(v_n32.T, tt_dvhd, preferred_element_type=f32)
    d_v_node = (
        jnp.dot(rt_dvhd, wvi_ref[...].astype(f32).T, preferred_element_type=f32)
        + jnp.dot(tt_dvhd, wvj_ref[...].astype(f32).T, preferred_element_type=f32)
    )
    d_xi = jnp.dot(d_vhd1, wve_ref[...].astype(f32).T, preferred_element_type=f32)
    dwve_ref[...] += jnp.dot(xi.astype(f32).T, d_vhd1, preferred_element_type=f32)

    dsn_ref[0] += d_s_node.astype(dsn_ref.dtype)
    dvn_ref[0] += d_v_node.astype(dvn_ref.dtype)
    pad_w = p - (se + 3 * ve_dim + 9 + 1)
    parts = [d_e, d_xi, d_ft, d_emask]
    if pad_w:
        parts.append(jnp.zeros((rows, pad_w), f32))
    dep_ref[0] = jnp.concatenate(parts, axis=1).astype(dt)


def fused_message_layer_bwd(
    s_node: jax.Array,  # [B, N, S]
    v_node: jax.Array,  # [B, N, 3V]
    epack: jax.Array,  # [B, N*N, P]
    gcp1_w: dict,
    chain_w: tuple,
    cotangents: Tuple[jax.Array, jax.Array],  # (d_s_agg [B,N,S], d_v_agg [B,N,3V])
    ve_dim: int,
    interpret: bool = False,
):
    """Backward pass of fused_message_layer (whole-molecule cells only).

    Returns (d_s_node, d_v_node, d_epack, d_g1 dict, d_chain tuple) with
    cotangent dtypes matching the primal inputs.
    """
    b, n, s_dim = s_node.shape
    v3 = v_node.shape[-1]
    v_dim = v3 // 3
    p = epack.shape[-1]
    h1 = gcp1_w["wu_bd"].shape[0] // 3
    w_comb, wsc, bsc, wu_bd, wgc, bgc, wattn, battn = chain_w
    hc = (w_comb.shape[2] - 27) // 3
    num_gcps = w_comb.shape[0]

    # source-tile size / fusion MUST match the forward's (shared helpers) —
    # the GEOM 44-181-atom range trains through the kernel, not AD fallback
    ti = select_tile(n)
    assert n % ti == 0, f"N={n} has no legal bwd tile; pad N to a multiple of 8"
    mols = select_fusion(b, n) if ti == n else 1

    ds_agg, dv_agg = cotangents
    if mols > 1:
        s_node_r = s_node.reshape(b // mols, mols * n, s_dim)
        v_node_r = v_node.reshape(b // mols, mols * n, v3)
        epack_r = epack.reshape(b // mols, mols * n * n, p)
        ds_agg_r = ds_agg.reshape(b // mols, mols * n, s_dim)
        dv_agg_r = dv_agg.reshape(b // mols, mols * n, v3)
    else:
        s_node_r, v_node_r, epack_r = s_node, v_node, epack
        ds_agg_r, dv_agg_r = ds_agg, dv_agg

    grid = (b // mols, n // ti)
    dt = s_node.dtype

    # precomputed selectors (see kernel comment): T always (tile-independent
    # in every mode); R only for whole-molecule cells (i0 == 0)
    rows_cell = mols * ti * n
    r1 = jnp.arange(rows_cell, dtype=jnp.int32)[:, None]
    b_idx = jnp.arange(mols * n, dtype=jnp.int32)[None, :]
    tsel = ((r1 // (n * n)) * n + r1 % n == b_idx).astype(dt)
    sel_r = ti == n
    rsel = ((r1 // n == b_idx).astype(dt) if sel_r
            else jnp.zeros((8, 128), dt))

    def nspec(width):
        return pl.BlockSpec((1, mols * n, width), lambda bb, tt: (bb, 0, 0),
                            memory_space=pltpu.VMEM)

    def espec():
        return pl.BlockSpec((1, mols * ti * n, p), lambda bb, tt: (bb, tt, 0),
                            memory_space=pltpu.VMEM)

    def full_spec(arr):
        return pl.BlockSpec(arr.shape, lambda bb, tt: tuple(0 for _ in arr.shape),
                            memory_space=pltpu.VMEM)

    def acc_spec(shape):
        return pl.BlockSpec(shape, lambda bb, tt: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    g1 = gcp1_w
    weight_args = [
        g1["wvi"], g1["wvj"], g1["wve"], g1["wsi"], g1["wsj"], g1["wsx"],
        g1["bs"], g1["wu_bd"], g1["wg"], g1["bg"],
        w_comb, wsc, bsc, wu_bd, wgc, bgc, wattn, battn,
    ]

    # weight-grad output shapes (f32; biases as 2D rows)
    wg_shapes = [
        g1["wvi"].shape, g1["wvj"].shape, g1["wve"].shape, g1["wsi"].shape,
        g1["wsj"].shape, g1["wsx"].shape,
        (1, s_dim),  # bs1
        g1["wu_bd"].shape, g1["wg"].shape, (1, v_dim),  # bg1
        w_comb.shape, wsc.shape, (num_gcps, s_dim), wu_bd.shape, wgc.shape,
        (num_gcps, v_dim), wattn.shape, (1, 1),
    ]

    kernel = functools.partial(
        _message_layer_bwd_kernel,
        ti=ti, n=n, s_dim=s_dim, v_dim=v_dim, ve_dim=ve_dim,
        h1=h1, hc=hc, num_gcps=num_gcps, mols=mols, sel_r=sel_r,
    )

    # node grads accumulate across source tiles -> keep them f32
    out_shape = (
        [
            jax.ShapeDtypeStruct(s_node_r.shape, jnp.float32),
            jax.ShapeDtypeStruct(v_node_r.shape, jnp.float32),
            jax.ShapeDtypeStruct(epack_r.shape, dt),
        ]
        + [jax.ShapeDtypeStruct(s, jnp.float32) for s in wg_shapes]
    )
    out_specs = (
        [nspec(s_dim), nspec(v3), espec()]
        + [acc_spec(s) for s in wg_shapes]
    )

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[nspec(s_dim), nspec(v3), espec(), nspec(s_dim), nspec(v3),
                  full_spec(rsel), full_spec(tsel)]
        + [full_spec(w) for w in weight_args],
        out_specs=out_specs,
        out_shape=out_shape,
        # the recompute keeps stage states + f32 transients resident; the
        # default 16 MiB scoped-vmem limit is conservative for v5e
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(s_node_r, v_node_r, epack_r, ds_agg_r, dv_agg_r, rsel, tsel,
      *weight_args)

    d_sn, d_vn, d_ep = outs[0].astype(dt), outs[1].astype(dt), outs[2]
    (d_wvi, d_wvj, d_wve, d_wsi, d_wsj, d_wsx, d_bs1,
     d_wu1, d_wg1, d_bg1, d_wcomb, d_wsc, d_bsc, d_wubd, d_wgc, d_bgc,
     d_wattn, d_battn) = outs[3:]

    if mols > 1:
        d_sn = d_sn.reshape(b, n, s_dim)
        d_vn = d_vn.reshape(b, n, v3)
        d_ep = d_ep.reshape(b, n * n, p)

    def cast(g, like):
        return g.astype(like.dtype)

    d_g1 = {
        "wvi": cast(d_wvi, g1["wvi"]), "wvj": cast(d_wvj, g1["wvj"]),
        "wve": cast(d_wve, g1["wve"]), "wsi": cast(d_wsi, g1["wsi"]),
        "wsj": cast(d_wsj, g1["wsj"]), "wsx": cast(d_wsx, g1["wsx"]),
        "bs": cast(d_bs1.reshape(g1["bs"].shape), g1["bs"]),
        "wu_bd": cast(d_wu1, g1["wu_bd"]), "wg": cast(d_wg1, g1["wg"]),
        "bg": cast(d_bg1.reshape(g1["bg"].shape), g1["bg"]),
    }
    d_chain = (
        cast(d_wcomb, w_comb), cast(d_wsc, wsc), cast(d_bsc.reshape(bsc.shape), bsc),
        cast(d_wubd, wu_bd), cast(d_wgc, wgc), cast(d_bgc.reshape(bgc.shape), bgc),
        cast(d_wattn, wattn), cast(d_battn.reshape(battn.shape), battn),
    )
    return d_sn, d_vn, d_ep, d_g1, d_chain
