"""Protein-pocket-conditional scaffolding: dataset metadata + context batching.

The reference delegates pocket-conditional ligand generation to its sibling
GCDM-SBDD repo but ships the dataset metadata here
(src/datamodules/components/edm/constants.py:98-1742: Binding MOAD /
CrossDocked atom & amino-acid encoders, bond tables, Lennard-Jones radii,
histograms, joint ligand/pocket size histograms).  This module loads those
tables (stored as compressed assets) and provides the dense batching for
pocket-context graphs: a ligand [B, Nl] + pocket [B, Np] pair padded into
one joint graph with role masks, ready for the same GCPNet/EVD stack.
"""

from __future__ import annotations

import gzip
import json
import os
from functools import lru_cache
from typing import Any, Dict, Optional, Tuple

import numpy as np

from bio_diffusion_tpu.data.batch import DenseMolBatch

_ASSET_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "assets")


@lru_cache(maxsize=1)
def load_pocket_dataset_params() -> Dict[str, Dict[str, Any]]:
    """dataset_params['bindingmoad' | 'crossdock_full' | 'crossdock']."""
    with gzip.open(os.path.join(_ASSET_DIR, "pocket_dataset_params.json.gz"), "rt") as f:
        meta = json.load(f)
    arrays = np.load(os.path.join(_ASSET_DIR, "pocket_dataset_params.npz"))
    out: Dict[str, Dict[str, Any]] = {k: dict(v) for k, v in meta.items()}
    for key in arrays.files:
        name, field = key.split("__", 1)
        out[name][field] = arrays[key]
    return out


def get_pocket_dataset_info(name: str) -> Dict[str, Any]:
    params = load_pocket_dataset_params()
    if name not in params:
        raise ValueError(f"Unknown pocket dataset {name}; have {sorted(params)}")
    info = dict(params[name])
    info.setdefault("name", name)
    return info


class JointLigandPocketBatch:
    """Dense joint graph: ligand nodes first, pocket nodes after.

    The diffusion process generates ligand nodes while pocket nodes are
    fixed conditioning (the inpainting machinery: node_mask_fixed = pocket
    rows).  Construction mirrors DiffSBDD-style joint batching but padded
    dense for TPU.
    """

    def __init__(
        self,
        ligand_x: np.ndarray,  # [B, Nl, 3]
        ligand_one_hot: np.ndarray,  # [B, Nl, Kl]
        ligand_mask: np.ndarray,  # [B, Nl]
        pocket_x: np.ndarray,  # [B, Np, 3]
        pocket_one_hot: np.ndarray,  # [B, Np, Kp]
        pocket_mask: np.ndarray,  # [B, Np]
    ):
        b, nl, kl = ligand_one_hot.shape
        np_, kp = pocket_one_hot.shape[1:]
        n = nl + np_
        k = kl + kp
        self.x = np.concatenate([ligand_x, pocket_x], axis=1).astype(np.float32)
        one_hot = np.zeros((b, n, k), np.float32)
        one_hot[:, :nl, :kl] = ligand_one_hot
        one_hot[:, nl:, kl:] = pocket_one_hot
        self.one_hot = one_hot
        self.node_mask = np.concatenate([ligand_mask, pocket_mask], axis=1).astype(np.float32)
        # fixed (conditioning) rows = pocket nodes
        self.fixed_mask = np.concatenate(
            [np.zeros_like(ligand_mask), pocket_mask], axis=1
        ).astype(np.float32)
        self.num_ligand_nodes = nl
        self.num_pocket_nodes = np_

    def as_dense_batch(self) -> DenseMolBatch:
        b, n = self.node_mask.shape
        return DenseMolBatch(
            x=self.x,
            one_hot=self.one_hot,
            charges=np.zeros((b, n, 1), np.float32),
            node_mask=self.node_mask,
            context=None,
        )


def sample_joint_sizes(
    dataset_name: str,
    num_samples: int,
    rng: np.random.Generator,
    pocket_size: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Sample (ligand_size, pocket_size) pairs from the joint n_nodes
    histogram (rows = ligand sizes, cols = pocket sizes)."""
    info = get_pocket_dataset_info(dataset_name)
    joint = np.asarray(info["n_nodes"], dtype=np.float64)
    if pocket_size is not None:
        col = joint[:, pocket_size]
        p = col / col.sum()
        lig = rng.choice(len(p), size=num_samples, p=p)
        return lig, np.full(num_samples, pocket_size)
    flat = joint.reshape(-1)
    p = flat / flat.sum()
    idx = rng.choice(len(flat), size=num_samples, p=p)
    lig, pock = np.unravel_index(idx, joint.shape)
    return lig, pock
