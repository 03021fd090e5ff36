"""ctypes bindings for the native (C++) data-loading components.

``native/xyz_parser.cc`` provides:
  * ``parse_gdb9_batch`` — bulk GDB9 xyz parsing (the QM9 preparation's hot
    host loop; ~2 orders of magnitude over the per-line Python parser)
  * ``collate_dense_batch`` — one-pass padded batch collation

Both are optional accelerations: every caller falls back to the numpy/
Python implementation when the shared library hasn't been built
(``make -C native``).  The build uses only g++ (no pybind11; C ABI+ctypes).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from bio_diffusion_tpu.utils.logging import get_logger

log = get_logger(__name__)

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native"
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libxyzparser.so")

_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def build_native(force: bool = False) -> bool:
    """Build the shared library with make; returns availability."""
    if os.path.exists(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
        return os.path.exists(_LIB_PATH)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        log.warning(f"native build failed ({e}); using Python fallbacks")
        return False


@lru_cache(maxsize=1)
def _load_lib():
    if not os.path.exists(_LIB_PATH) and not build_native():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.parse_gdb9_batch.restype = ctypes.c_int64
    lib.parse_gdb9_batch.argtypes = [
        ctypes.c_char_p, _i64p, _i64p, ctypes.c_int64, ctypes.c_int64,
        _f64p, _i64p, _f64p, _i64p,
    ]
    lib.collate_dense_batch.restype = None
    lib.collate_dense_batch.argtypes = [
        _f64p, _i64p, ctypes.c_int64, _i64p, ctypes.c_int64, ctypes.c_int64,
        _i64p, ctypes.c_int64, _f32p, _f32p, _f32p, _f32p,
    ]
    return lib


def native_available() -> bool:
    return _load_lib() is not None


GDB9_PROP_NAMES = [
    "index", "A", "B", "C", "mu", "alpha", "homo", "lumo", "gap", "r2",
    "zpve", "U0", "U", "H", "G", "Cv", "omega1",
]


def parse_gdb9_records(
    records: Sequence[bytes],
    max_atoms: int = 29,
) -> Dict[str, np.ndarray]:
    """Parse a batch of raw GDB9 xyz record buffers natively.

    Returns padded arrays {positions [M,max,3], charges [M,max],
    num_atoms [M], <prop> [M] ...}; records that fail to parse get
    num_atoms == -1 (caller filters).  Falls back to the Python parser.
    """
    lib = _load_lib()
    m = len(records)
    if lib is None:
        from bio_diffusion_tpu.data.qm9 import parse_xyz_gdb9

        out = {
            "positions": np.zeros((m, max_atoms, 3)),
            "charges": np.zeros((m, max_atoms), np.int64),
            "num_atoms": np.full(m, -1, np.int64),
        }
        props = {k: np.zeros(m) for k in GDB9_PROP_NAMES}
        for i, rec in enumerate(records):
            try:
                mol = parse_xyz_gdb9(rec.decode("utf-8").splitlines(keepends=True))
            except Exception:
                continue
            n = int(mol["num_atoms"])
            out["num_atoms"][i] = n
            out["positions"][i, :n] = mol["positions"]
            out["charges"][i, :n] = mol["charges"]
            for k in GDB9_PROP_NAMES:
                if k in mol:
                    props[k][i] = mol[k]
        out.update(props)
        return out

    buf = b"".join(records)
    lengths = np.array([len(r) for r in records], np.int64)
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int64)
    positions = np.zeros((m, max_atoms, 3), np.float64)
    charges = np.zeros((m, max_atoms), np.int64)
    props = np.zeros((m, 17), np.float64)
    n_atoms = np.zeros(m, np.int64)
    lib.parse_gdb9_batch(buf, offsets, lengths, m, max_atoms, positions, charges, props, n_atoms)
    out = {"positions": positions, "charges": charges, "num_atoms": n_atoms}
    for i, name in enumerate(GDB9_PROP_NAMES):
        out[name] = props[:, i].copy()
    return out


def collate_dense_native(
    positions: np.ndarray,  # [M, n_src, 3] float64
    charges: np.ndarray,  # [M, n_src] int64
    sel: np.ndarray,  # [B] int64
    n_pad: int,
    species: np.ndarray,  # [K] int64
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """One-pass padded collation; None when the native lib is unavailable
    or when the source arrays would require a full-dataset copy (wrong
    dtype/layout) — callers fall back to numpy then."""
    lib = _load_lib()
    if lib is None:
        return None
    if not (
        positions.dtype == np.float64 and positions.flags.c_contiguous
        and charges.dtype == np.int64 and charges.flags.c_contiguous
    ):
        return None
    sel = np.ascontiguousarray(sel, np.int64)
    species = np.ascontiguousarray(species, np.int64)
    b = len(sel)
    k = len(species)
    x = np.zeros((b, n_pad, 3), np.float32)
    one_hot = np.zeros((b, n_pad, k), np.float32)
    ch = np.zeros((b, n_pad), np.float32)
    mask = np.zeros((b, n_pad), np.float32)
    lib.collate_dense_batch(
        positions, charges, positions.shape[1], sel, b, n_pad, species, k,
        x, one_hot, ch, mask,
    )
    return x, one_hot, ch, mask
