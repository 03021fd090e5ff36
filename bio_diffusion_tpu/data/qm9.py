"""QM9 (GDB9) dataset pipeline: download, xyz parsing, splits, thermo, loading.

Behavioral counterpart of the reference's EDM QM9 pipeline
(src/datamodules/components/edm/{download,qm9,process,utils}.py and
edm_dataset.ProcessedDataset), numpy-native (no torch):

  * figshare GDB9 tarball + uncharacterized exclusion list + atomref thermo
  * fixed seed-0 permutation split: 100k train / 10% test / rest valid
  * per-split npz files with padded [M, 29] arrays
  * species one-hot from charges; thermo-target subtraction; eV conversion
  * QM9_first_half / QM9_second_half fixed seed-42 re-splits

Network access is gated: in offline environments ``prepare_qm9`` raises a
clear error unless the processed npz files already exist.
"""

from __future__ import annotations

import logging
import os
import tarfile
from os.path import join
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from bio_diffusion_tpu.chem.constants import CHARGE_DICT
from bio_diffusion_tpu.data.batch import DenseDataset

log = logging.getLogger(__name__)

GDB9_URL_DATA = "https://springernature.figshare.com/ndownloader/files/3195389"
GDB9_URL_EXCLUDED = "https://springernature.figshare.com/ndownloader/files/3195404"
GDB9_URL_THERMO = "https://springernature.figshare.com/ndownloader/files/3195395"

QM9_PROPERTY_NAMES = [
    "index", "A", "B", "C", "mu", "alpha", "homo", "lumo", "gap", "r2",
    "zpve", "U0", "U", "H", "G", "Cv",
]

# Hartree->eV conversions applied by the reference dataloader factory
# (edm/dataset.py:48-54)
QM9_TO_EV = {
    "U0": 27.2114, "U": 27.2114, "G": 27.2114, "H": 27.2114,
    "zpve": 27211.4, "gap": 27.2114, "homo": 27.2114, "lumo": 27.2114,
}

THERMO_TARGETS = ["zpve", "U0", "U", "H", "G", "Cv"]

NUM_GDB9 = 133885
NUM_EXCLUDED = 3054
NUM_TRAIN = 100000


def parse_xyz_gdb9(lines: List[str]) -> Dict[str, np.ndarray]:
    """Parse one GDB9 xyz record (reference process.py:process_xyz_gdb9)."""
    num_atoms = int(lines[0])
    mol_props = lines[1].split()
    mol_xyz = lines[2: num_atoms + 2]
    mol_freq = lines[num_atoms + 2]

    charges, positions = [], []
    for line in mol_xyz:
        atom, px, py, pz, _ = line.replace("*^", "e").split()
        charges.append(CHARGE_DICT[atom])
        positions.append([float(px), float(py), float(pz)])

    out: Dict[str, np.ndarray] = {
        "num_atoms": np.int64(num_atoms),
        "charges": np.asarray(charges, dtype=np.int64),
        "positions": np.asarray(positions, dtype=np.float64),
    }
    values = [int(mol_props[1])] + [float(v) for v in mol_props[2:]]
    for name, val in zip(QM9_PROPERTY_NAMES, values):
        out[name] = np.float64(val) if name != "index" else np.int64(val)
    out["omega1"] = np.float64(max(float(w) for w in mol_freq.split()))
    return out


def _pad_stack(molecules: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack a list of molecule dicts, padding ragged arrays to the max size."""
    keys = molecules[0].keys()
    out = {}
    for key in keys:
        vals = [m[key] for m in molecules]
        if np.ndim(vals[0]) == 0:
            out[key] = np.stack(vals)
        else:
            max_n = max(len(v) for v in vals)
            shape = (len(vals), max_n) + np.shape(vals[0])[1:]
            arr = np.zeros(shape, dtype=np.asarray(vals[0]).dtype)
            for i, v in enumerate(vals):
                arr[i, : len(v)] = v
            out[key] = arr
    return out


def gen_splits_gdb9(excluded_lines: List[str]) -> Dict[str, np.ndarray]:
    """Fixed seed-0 train/valid/test molecule-index split (reference qm9.py:90-160)."""
    excluded = []
    for line in excluded_lines:
        parts = line.split()
        if parts:
            try:
                excluded.append(int(parts[0]) - 1)
            except ValueError:
                continue
    assert len(excluded) == NUM_EXCLUDED, f"expected {NUM_EXCLUDED} exclusions, got {len(excluded)}"

    included = np.array(sorted(set(range(NUM_GDB9)) - set(excluded)))
    n_mols = NUM_GDB9 - NUM_EXCLUDED
    n_test = int(0.1 * n_mols)
    n_valid = n_mols - (NUM_TRAIN + n_test)

    rs = np.random.RandomState(0)
    perm = rs.permutation(n_mols)
    train, valid, test = np.split(perm, [NUM_TRAIN, NUM_TRAIN + n_valid])
    return {"train": included[train], "valid": included[valid], "test": included[test]}


def parse_thermo(atomref_lines: List[str]) -> Dict[str, Dict[int, float]]:
    """Thermochemical reference energies per element (reference qm9.py:162-204)."""
    id2charge = CHARGE_DICT
    therm = {t: {} for t in THERMO_TARGETS}
    for line in atomref_lines:
        parts = line.split()
        if not parts or parts[0] not in id2charge:
            continue
        for target, value in zip(THERMO_TARGETS, parts[1:]):
            therm[target][id2charge[parts[0]]] = float(value)
    return therm


def add_thermo_targets(data: Dict[str, np.ndarray], therm: Dict[str, Dict[int, float]]):
    """Add <prop>_thermo columns: per-molecule summed atomic reference energies."""
    charges = data["charges"]
    for target, per_element in therm.items():
        thermo = np.zeros(len(charges))
        for z, energy in per_element.items():
            thermo += energy * (charges == z).sum(axis=1)
        data[target + "_thermo"] = thermo
    return data


def process_gdb9_tar(tar_path: str, splits: Dict[str, np.ndarray]) -> Dict[str, Dict[str, np.ndarray]]:
    """Extract + parse the GDB9 tarball into per-split padded dicts."""
    out = {}
    with tarfile.open(tar_path, "r") as tar:
        members = tar.getmembers()
        for split, split_idx in splits.items():
            wanted = set(int(i) for i in split_idx)
            molecules = []
            for i, member in enumerate(members):
                if i not in wanted:
                    continue
                f = tar.extractfile(member)
                lines = [l.decode("utf-8") for l in f.readlines()]
                molecules.append(parse_xyz_gdb9(lines))
            out[split] = _pad_stack(molecules)
    return out


def prepare_qm9(data_dir: str, dataset: str = "QM9", force_download: bool = False) -> Dict[str, str]:
    """Ensure per-split npz files exist; download + process if missing.

    Returns {"train": path, "valid": path, "test": path}.
    """
    qm9_dir = join(data_dir, "QM9")
    os.makedirs(qm9_dir, exist_ok=True)
    datafiles = {s: join(qm9_dir, f"{s}.npz") for s in ("train", "valid", "test")}
    exists = [os.path.exists(p) for p in datafiles.values()]
    if all(exists) and not force_download:
        return datafiles
    if any(exists) and not all(exists):
        raise ValueError(f"QM9 only partially processed under {qm9_dir}; delete and retry.")

    import urllib.request

    log.info("Downloading GDB9 dataset to %s ...", qm9_dir)
    tar_path = join(qm9_dir, "dsgdb9nsd.xyz.tar.bz2")
    excluded_path = join(qm9_dir, "uncharacterized.txt")
    thermo_path = join(qm9_dir, "atomref.txt")
    try:
        urllib.request.urlretrieve(GDB9_URL_DATA, filename=tar_path)
        urllib.request.urlretrieve(GDB9_URL_EXCLUDED, filename=excluded_path)
        urllib.request.urlretrieve(GDB9_URL_THERMO, filename=thermo_path)
    except Exception as e:  # zero-egress environments
        raise RuntimeError(
            f"QM9 download failed ({e}). In offline environments, place the "
            f"processed train/valid/test .npz files under {qm9_dir} "
            "(same layout as the EDM reference pipeline)."
        ) from e

    with open(excluded_path) as f:
        splits = gen_splits_gdb9(f.readlines())
    data = process_gdb9_tar(tar_path, splits)
    with open(thermo_path) as f:
        therm = parse_thermo(f.readlines())
    for split in data:
        data[split] = add_thermo_targets(data[split], therm)
        np.savez_compressed(datafiles[split], **data[split])
    return datafiles


def _remove_hydrogens(data: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Drop H atoms and re-center (reference edm/utils.py:168-191)."""
    pos, charges = data["positions"], data["charges"]
    new_pos = np.zeros_like(pos)
    new_charges = np.zeros_like(charges)
    for i in range(len(pos)):
        m = charges[i] > 1
        p = pos[i][m]
        if len(p):
            p = p - p.mean(axis=0)
        n = int(m.sum())
        new_pos[i, :n] = p
        new_charges[i, :n] = charges[i][m]
    out = dict(data)
    out["positions"] = new_pos
    out["charges"] = new_charges
    out["num_atoms"] = (new_charges > 0).sum(axis=1)
    return out


def load_qm9_datasets(
    data_dir: str,
    dataset: str = "QM9",
    remove_h: bool = False,
    subtract_thermo: bool = True,
    num_pts: Optional[Dict[str, int]] = None,
    force_download: bool = False,
    remove_zero_charge_molecules: bool = True,
    convert_to_ev: bool = True,
) -> Dict[str, DenseDataset]:
    """Load QM9 splits as DenseDatasets (reference initialize_datasets +
    ProcessedDataset + unit conversion, rolled together)."""
    datafiles = prepare_qm9(data_dir, force_download=force_download)
    datasets = {}
    for split, path in datafiles.items():
        with np.load(path) as f:
            datasets[split] = {k: np.array(v) for k, v in f.items()}

    # first/second-half re-splits of train (fixed seed-42 permutation)
    if dataset in ("QM9_second_half", "QM9_first_half"):
        rs = np.random.RandomState(42)
        n = len(datasets["train"]["num_atoms"])
        perm = rs.permutation(n)
        sl = perm[n // 2:] if dataset == "QM9_second_half" else perm[: n // 2]
        datasets["train"] = {k: v[sl] for k, v in datasets["train"].items()}
    elif dataset != "QM9":
        raise ValueError(f"Unknown QM9 variant {dataset}")

    if remove_h:
        datasets = {k: _remove_hydrogens(v) for k, v in datasets.items()}

    # global species list
    all_species = np.unique(np.concatenate([d["charges"].reshape(-1) for d in datasets.values()]))
    all_species = all_species[all_species > 0]

    out = {}
    for split, data in datasets.items():
        if remove_zero_charge_molecules:
            keep = data["charges"].sum(-1) > 0
            data = {k: v[keep] for k, v in data.items()}
        if subtract_thermo:
            for key in [k.split("_")[0] for k in data if k.endswith("_thermo")]:
                data[key] = data[key] - data[key + "_thermo"]
        if convert_to_ev:
            for key, factor in QM9_TO_EV.items():
                if key in data:
                    data[key] = data[key] * factor
        if num_pts and num_pts.get(split, -1) > 0:
            data = {k: v[: num_pts[split]] for k, v in data.items()}
        data["one_hot"] = (data["charges"][..., None] == all_species[None, None, :]).astype(np.float32)
        out[split] = DenseDataset(data, included_species=all_species)
    return out
