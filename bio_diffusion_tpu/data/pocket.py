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
    histogram (rows = ligand sizes, cols = pocket sizes).  Size-0 rows/cols
    are zeroed (the shipped histograms are smoothed floats with residual
    mass at 0, and an empty ligand or pocket is not a sampleable graph)."""
    info = get_pocket_dataset_info(dataset_name)
    joint = np.asarray(info["n_nodes"], dtype=np.float64).copy()
    joint[0, :] = 0.0
    joint[:, 0] = 0.0
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


def ligand_dataset_info(dataset_name: str) -> Dict[str, Any]:
    """Registry-format dataset_info for the LIGAND atom space of a pocket
    dataset — used to run the standard stability/validity metrics and xyz
    I/O on generated ligands (the pocket is conditioning, not output).

    Bond tables are the dataset's own shipped matrices (reference
    constants.py dataset_params[...]['bonds1'..'bonds3'], in pm like the
    global tables)."""
    info = get_pocket_dataset_info(dataset_name)
    atom_encoder = dict(info["atom_encoder"])
    atom_decoder = list(info["atom_decoder"])
    joint = np.asarray(info["n_nodes"], dtype=np.float64)
    lig_marginal = joint.sum(axis=1)
    n_nodes = {i: float(c) for i, c in enumerate(lig_marginal) if i > 0 and c > 0}
    return {
        "name": f"{dataset_name}_ligand",
        "atom_encoder": atom_encoder,
        "atom_decoder": atom_decoder,
        "atom_types": {atom_encoder[e]: float(c) for e, c in info["atom_hist"].items()},
        "n_nodes": n_nodes,
        "max_n_nodes": int(max(n_nodes)),
        "with_h": False,  # heavy-atom ligand representation
        "bonds1": np.asarray(info["bonds1"], dtype=np.float64),
        "bonds2": np.asarray(info["bonds2"], dtype=np.float64),
        "bonds3": np.asarray(info["bonds3"], dtype=np.float64),
        "colors_dic": list(info.get("colors_dic", [])) or None,
        "radius_dic": np.asarray(info["radius_dic"], dtype=np.float64),
    }


def joint_dataset_info(dataset_name: str) -> Dict[str, Any]:
    """Registry-format dataset_info for the JOINT ligand+pocket graph the
    diffusion model is defined over: ligand atom types occupy one-hot dims
    [0, Kl), pocket residue (CA) types occupy [Kl, Kl+Kp) — the same layout
    as JointLigandPocketBatch.  Residue labels are prefixed ("res_A") so
    they never collide with element symbols."""
    info = get_pocket_dataset_info(dataset_name)
    lig_dec = list(info["atom_decoder"])
    aa_dec = [f"res_{a}" for a in info["aa_decoder"]]
    decoder = lig_dec + aa_dec
    encoder = {s: i for i, s in enumerate(decoder)}
    kl = len(lig_dec)
    atom_types = {info["atom_encoder"][e]: float(c) for e, c in info["atom_hist"].items()}
    for a, c in info["aa_hist"].items():
        atom_types[kl + info["aa_encoder"][a]] = float(c)
    # joint-total node-count histogram (ligand + pocket size per graph)
    joint = np.asarray(info["n_nodes"], dtype=np.float64)
    totals: Dict[int, float] = {}
    for li in range(joint.shape[0]):
        for pi in range(joint.shape[1]):
            if li > 0 and pi > 0 and joint[li, pi] > 0:
                totals[li + pi] = totals.get(li + pi, 0.0) + float(joint[li, pi])
    return {
        "name": dataset_name,
        "atom_encoder": encoder,
        "atom_decoder": decoder,
        "atom_types": atom_types,
        "num_ligand_atom_types": kl,
        "n_nodes": totals,
        "max_n_nodes": int(max(totals)),
        "with_h": False,
    }


# PDB 3-letter -> 1-letter residue codes (the aa_encoder key alphabet;
# reference metadata: /root/reference/src/datamodules/components/edm/
# constants.py:98-1742 encodes pockets as one-letter CA residues)
THREE_TO_ONE = {
    "ALA": "A", "CYS": "C", "ASP": "D", "GLU": "E", "PHE": "F",
    "GLY": "G", "HIS": "H", "ILE": "I", "LYS": "K", "LEU": "L",
    "MET": "M", "ASN": "N", "PRO": "P", "GLN": "Q", "ARG": "R",
    "SER": "S", "THR": "T", "VAL": "V", "TRP": "W", "TYR": "Y",
    # common nonstandard residues mapped to their parent
    "MSE": "M", "SEC": "C", "PYL": "K", "HSD": "H", "HSE": "H",
}


def load_pocket_pdb(
    path: str,
    pocket_name: str = "bindingmoad",
    chain: Optional[str] = None,
    center: Optional[np.ndarray] = None,
    radius: Optional[float] = None,
    ligand_resname: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract a CA-level binding pocket from a real PDB file (host-side,
    stdlib parsing — no biopython dependency).

    Day-one path for Binding MOAD / CrossDocked structures: the pocket is
    the set of CA atoms, optionally restricted to one ``chain`` and/or to
    a ball of ``radius`` angstroms around ``center``.  ``ligand_resname``
    computes the center from that HETATM residue's centroid (the usual
    binding-site definition: CAs within cutoff of the bound ligand).

    Returns (coords [P, 3] float32, residue type indices [P] int64 in the
    dataset's aa_encoder alphabet).  Unknown/nonstandard residues without
    a THREE_TO_ONE parent are skipped with a warning count.
    """
    info = get_pocket_dataset_info(pocket_name)
    aa_enc = info["aa_encoder"]
    coords, residues, skipped = [], [], 0
    het_coords = []
    with open(path) as f:
        for line in f:
            rec = line[:6].strip()
            if rec == "ENDMDL":  # first model only (NMR ensembles)
                break
            if rec not in ("ATOM", "HETATM"):
                continue
            try:
                xyz = (float(line[30:38]), float(line[38:46]), float(line[46:54]))
            except ValueError:
                continue
            resname = line[17:20].strip()
            if rec == "HETATM":
                if ligand_resname and resname == str(ligand_resname).strip():
                    het_coords.append(xyz)
                continue
            if line[12:16].strip() != "CA":
                continue
            if chain and line[21].strip() != str(chain):
                continue
            altloc = line[16].strip()
            if altloc not in ("", "A"):  # first alternate location only
                continue
            one = THREE_TO_ONE.get(resname)
            if one is None or one not in aa_enc:
                skipped += 1
                continue
            coords.append(xyz)
            residues.append(aa_enc[one])
    if ligand_resname:
        if not het_coords:
            raise ValueError(
                f"no HETATM residue {ligand_resname!r} in {path} to center the pocket on"
            )
        center = np.mean(np.asarray(het_coords, dtype=np.float64), axis=0)
        if radius is None:
            radius = 8.0  # the GCDM-SBDD-style binding-site cutoff
    x = np.asarray(coords, dtype=np.float32).reshape(-1, 3)
    aa = np.asarray(residues, dtype=np.int64)
    if center is not None and radius is not None:
        keep = np.linalg.norm(x - np.asarray(center, np.float32)[None], axis=-1) <= float(radius)
        x, aa = x[keep], aa[keep]
    if len(x) == 0:
        raise ValueError(f"no pocket CA atoms extracted from {path} "
                         f"(chain={chain}, radius={radius}, skipped={skipped})")
    if skipped:
        import warnings

        warnings.warn(f"{path}: skipped {skipped} CA atoms with residues "
                      "outside the aa_encoder alphabet", stacklevel=2)
    return x, aa


def synthetic_pockets(
    dataset_name: str,
    pocket_sizes: np.ndarray,
    rng: np.random.Generator,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Geometrically-plausible synthetic binding pockets for tests and the
    zero-egress demo path: CA atoms on a jittered spherical shell (radius
    grown with residue count to keep CA density protein-like, ~5 A nearest
    neighbors), residue types drawn from the dataset's aa histogram.

    Returns (x [B, Np, 3], aa_types [B, Np], mask [B, Np]) padded to
    max(pocket_sizes).  Not a substitute for Binding MOAD / CrossDocked
    structures — a substitute for their *shape* (like data/synthetic.py)."""
    info = get_pocket_dataset_info(dataset_name)
    aa_hist = info["aa_hist"]
    aa_probs = np.array([float(aa_hist[a]) for a in info["aa_decoder"]], dtype=np.float64)
    aa_probs /= aa_probs.sum()

    pocket_sizes = np.asarray(pocket_sizes, dtype=np.int64)
    b, np_max = len(pocket_sizes), int(pocket_sizes.max())
    x = np.zeros((b, np_max, 3), dtype=np.float32)
    aa = np.zeros((b, np_max), dtype=np.int64)
    mask = np.zeros((b, np_max), dtype=np.float32)
    for i, n in enumerate(pocket_sizes):
        # shell radius so that n CAs at ~5 A spacing cover the sphere area
        radius = max(6.0, np.sqrt(n * 5.0**2 / (4.0 * np.pi)) * 2.0)
        dirs = rng.normal(size=(n, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        r = radius + rng.normal(scale=1.0, size=(n, 1))
        x[i, :n] = dirs * r
        aa[i, :n] = rng.choice(len(aa_probs), size=n, p=aa_probs)
        mask[i, :n] = 1.0
    return x, aa, mask


def synthetic_pocket_joint_dataset(
    dataset_name: str,
    num_graphs: int = 256,
    seed: int = 0,
    max_total_nodes: Optional[int] = None,
):
    """Synthetic JOINT ligand+pocket dataset in the DenseDataset schema, for
    hermetic training of the unconditional joint model that RePaint pocket
    conditioning samples from (real Binding MOAD / CrossDocked structures
    are unreachable in a zero-egress environment; this substitutes their
    shape).  Ligand atoms are a random-walk chain inside the pocket shell;
    one-hot columns follow joint_dataset_info's [ligand | residue] layout."""
    from bio_diffusion_tpu.data.batch import DenseDataset

    rng = np.random.default_rng(seed)
    info = get_pocket_dataset_info(dataset_name)
    kl = len(info["atom_decoder"])
    kp = len(info["aa_decoder"])
    atom_probs = np.array(
        [float(info["atom_hist"][e]) for e in info["atom_decoder"]], dtype=np.float64
    )
    atom_probs /= atom_probs.sum()

    lig_sizes, pock_sizes = sample_joint_sizes(dataset_name, num_graphs, rng)
    if max_total_nodes is not None:
        # resample pairs that exceed the cap (keeps tests/training small)
        for i in range(num_graphs):
            while lig_sizes[i] + pock_sizes[i] > max_total_nodes:
                l2, p2 = sample_joint_sizes(dataset_name, 1, rng)
                lig_sizes[i], pock_sizes[i] = l2[0], p2[0]
    totals = lig_sizes + pock_sizes
    n_max = int(totals.max())

    pock_x, pock_aa, _ = synthetic_pockets(dataset_name, pock_sizes, rng)
    positions = np.zeros((num_graphs, n_max, 3), dtype=np.float64)
    one_hot = np.zeros((num_graphs, n_max, kl + kp), dtype=np.float32)
    for i in range(num_graphs):
        nl, npk = int(lig_sizes[i]), int(pock_sizes[i])
        steps = rng.normal(size=(nl, 3))
        steps /= np.linalg.norm(steps, axis=-1, keepdims=True)
        lig = np.cumsum(steps * 1.5, axis=0)
        lig -= lig.mean(axis=0)  # ligand centered in the pocket
        positions[i, :nl] = lig
        positions[i, nl: nl + npk] = pock_x[i, :npk]
        lig_types = rng.choice(kl, size=nl, p=atom_probs)
        one_hot[i, np.arange(nl), lig_types] = 1.0
        one_hot[i, nl + np.arange(npk), kl + pock_aa[i, :npk]] = 1.0

    present = one_hot.sum(-1) > 0
    data = {
        "num_atoms": totals.astype(np.int64),
        "num_ligand_atoms": lig_sizes.astype(np.int64),
        "positions": positions,
        # 1-indexed type id: the dense collator derives node presence from
        # charges > 0 (data/batch.py), and the pocket config runs with
        # include_charges=False so this column is presence-only
        "charges": (one_hot.argmax(-1).astype(np.int64) + 1) * present,
        "one_hot": one_hot,
        "index": np.arange(num_graphs, dtype=np.int64),
    }
    return DenseDataset(data, included_species=np.arange(1, kl + kp + 1))
