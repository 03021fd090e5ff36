"""Import reference PyTorch-Lightning checkpoints into the JAX param tree.

The reference releases Lightning ``.ckpt`` files (plus paired ``*-EMA.ckpt``
weight-averaged variants; src/utils/__init__.py:238-271, Zenodo 13375913).
This module maps their ``state_dict`` names onto our flax tree:

  torch module path                         -> flax path
  ------------------------------------------------------------------
  ddpm.dynamics_network.<...>               -> params/dynamics/<...>
  <mod_list>.<i>.<...>                      -> <mod_list>_<i>/<...>
  <gcp>.scalar_out.weight                   -> <gcp>/scalar_out_head/scalar_out/kernel (T)
  <gcp>.scalar_out.<i>.weight (sequential)  -> <gcp>/scalar_out_head/scalar_out_<i>/kernel (T)
  scalar_message_attention.0.*              -> scalar_message_attention/*
  <linear>.weight [out,in]                  -> <linear>/kernel [in,out] (transposed)
  LayerNorm weight/bias                     -> scalar_norm/{scale,bias}
  ddpm.gamma.gamma (PredefinedNoiseSchedule)-> (recomputed table, not a param)
  ddpm.gamma.l{1,2,3}.weight / gamma_{0,1}  -> gamma/l{1,2,3}/weight (T) / gamma_{0,1}

Loading uses ``torch.load(map_location='cpu')`` (torch-cpu is a host-side
dependency only; the TPU path never imports torch).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from bio_diffusion_tpu.utils.logging import get_logger

log = get_logger(__name__)

# module-list containers whose integer indices become name suffixes in flax
_INDEXED_CONTAINERS = (
    "interaction_layers",
    "message_fusion",
    "feedforward_network",
    "gcp_norm",
    "gcp_dropout",
    # EGNN dynamics containers (torch Sequential / ModuleList indices)
    "mpnn_layers",
    "edge_mlp",
    "node_mlp",
    "coors_mlp",
)

_SKIP_PREFIXES = ("num_nodes_distribution", "molecular_metrics")


def torch_name_to_flax_path(name: str) -> Optional[List[str]]:
    """Map one state_dict key to a flax path list (leaf renames happen in
    :func:`convert_state_dict`).  Returns None for keys with no counterpart."""
    parts = name.split(".")
    if parts and parts[0] == "ddpm":
        parts = parts[1:]
    if not parts:
        return None
    joined = ".".join(parts)
    if joined.startswith(_SKIP_PREFIXES):
        return None
    if re.match(r"^(train|val|test)_", parts[0]):
        return None
    if joined == "gamma.gamma":  # PredefinedNoiseSchedule lookup table
        return None
    if parts[0] == "dynamics_network":
        parts = ["dynamics"] + parts[1:]

    out: List[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        nxt_is_digit = i + 1 < len(parts) and parts[i + 1].isdigit()
        if p in _INDEXED_CONTAINERS and nxt_is_digit:
            out.append(f"{p}_{parts[i + 1]}")
            i += 2
        elif p == "scalar_out":
            if nxt_is_digit:
                out.extend(["scalar_out_head", f"scalar_out_{parts[i + 1]}"])
                i += 2
            else:
                out.extend(["scalar_out_head", "scalar_out"])
                i += 1
        elif p == "scalar_message_attention" and nxt_is_digit:
            # reference: Sequential(Linear, Sigmoid) -> plain Linear here
            out.append(p)
            i += 2
        else:
            out.append(p)
            i += 1
    # EGNN dynamics: 'egnn.mpnn_layers.<i>' is one flax module 'egnn_mpnn_layers_<i>'
    merged: List[str] = []
    j = 0
    while j < len(out):
        if out[j] == "egnn" and j + 1 < len(out) and out[j + 1].startswith("mpnn_layers_"):
            merged.append(f"egnn_{out[j + 1]}")
            j += 2
        else:
            merged.append(out[j])
            j += 1
    return merged


def convert_state_dict(state_dict: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Flat {'a/b/c': array} mapping of the converted tree."""
    flat: Dict[str, np.ndarray] = {}
    for name, tensor in state_dict.items():
        path = torch_name_to_flax_path(name)
        if path is None:
            continue
        arr = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach") else tensor)
        leaf = path[-1]
        if leaf == "weight":
            if "atom_embedding" in path:
                path = path[:-1] + ["embedding"]  # flax nn.Embed, no transpose
            elif len(path) >= 2 and path[0] == "gamma":
                arr = arr.T  # PositiveLinear stores [in, out] here
            elif arr.ndim == 2:
                path = path[:-1] + ["kernel"]  # torch Linear [out, in] -> [in, out]
                arr = arr.T
            elif arr.ndim == 1 and len(path) >= 2 and path[-2] == "scalar_norm":
                path = path[:-1] + ["scale"]  # flax LayerNorm scale
            # (1-D 'weight' elsewhere, e.g. GraphLayerNorm, keeps its name)
        flat["/".join(path)] = arr
    return flat


def unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def flatten_params(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_params(v, key))
        else:
            out[key] = v
    return out


def import_torch_checkpoint(
    ckpt_path: str,
    params_template: Dict[str, Any],
    strict: bool = True,
) -> Dict[str, Any]:
    """Load a reference .ckpt and return a params pytree matching the template.

    ``params_template`` is a freshly-initialized flax variables dict
    ({'params': {...}}); imported leaves must match its shapes.
    """
    import torch

    payload = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    state_dict = payload.get("state_dict", payload)
    return import_state_dict(state_dict, params_template, strict=strict)


def import_state_dict(
    state_dict: Dict[str, Any],
    params_template: Dict[str, Any],
    strict: bool = True,
) -> Dict[str, Any]:
    flat_imported = convert_state_dict(state_dict)

    template_params = params_template["params"] if "params" in params_template else params_template
    flat_template = flatten_params(template_params)

    missing = sorted(set(flat_template) - set(flat_imported))
    unexpected = sorted(set(flat_imported) - set(flat_template))
    if missing or unexpected:
        msg = (
            f"Checkpoint import mismatch: {len(missing)} missing "
            f"(e.g. {missing[:5]}), {len(unexpected)} unexpected "
            f"(e.g. {unexpected[:5]})"
        )
        if strict:
            raise KeyError(msg)
        log.warning(msg)

    out_flat = {}
    for key, tmpl in flat_template.items():
        if key in flat_imported:
            arr = flat_imported[key]
            if tuple(arr.shape) != tuple(np.shape(tmpl)):
                raise ValueError(
                    f"Shape mismatch at {key}: ckpt {arr.shape} vs model {np.shape(tmpl)}"
                )
            out_flat[key] = arr.astype(np.asarray(tmpl).dtype)
        else:
            out_flat[key] = tmpl

    new_params = unflatten(out_flat)
    if "params" in params_template:
        return {**params_template, "params": new_params}
    return new_params


def export_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse mapping: our params -> reference-style state_dict names.

    Used for round-trip testing and for exporting weights back to the
    reference toolchain.
    """
    flat = flatten_params(params["params"] if "params" in params else params)
    out = {}
    for key, arr in flat.items():
        parts = key.split("/")
        arr = np.asarray(arr)
        # leaf renames (inverse of convert_state_dict)
        leaf = parts[-1]
        if leaf == "kernel":
            parts = parts[:-1] + ["weight"]
            arr = arr.T
        elif leaf == "scale" and len(parts) >= 2 and parts[-2] == "scalar_norm":
            parts = parts[:-1] + ["weight"]
        elif leaf == "embedding":
            parts = parts[:-1] + ["weight"]
        elif leaf == "weight" and parts[0] == "gamma" and arr.ndim == 2:
            arr = arr.T
        # path renames
        name_parts: List[str] = []
        for p in parts:
            m_egnn = re.fullmatch(r"egnn_mpnn_layers_(\d+)", p)
            if m_egnn:
                name_parts.extend(["egnn", "mpnn_layers", m_egnn.group(1)])
                continue
            if p == "dynamics":
                name_parts.append("dynamics_network")
            elif p == "scalar_out_head":
                continue
            elif p.startswith("scalar_out_") and p[len("scalar_out_"):].isdigit():
                name_parts.extend(["scalar_out", p.split("_")[-1]])
            elif p == "scalar_out":
                name_parts.append("scalar_out")
            elif p == "scalar_message_attention":
                name_parts.extend(["scalar_message_attention", "0"])
            else:
                m = re.fullmatch(r"(" + "|".join(_INDEXED_CONTAINERS) + r")_(\d+)", p)
                if m:
                    name_parts.extend([m.group(1), m.group(2)])
                else:
                    name_parts.append(p)
        out["ddpm." + ".".join(name_parts)] = arr
    return out
