"""Native C++ xyz parser / collator vs the Python implementations."""

import numpy as np
import pytest

from bio_diffusion_tpu.data.native_loader import (
    collate_dense_native,
    native_available,
    parse_gdb9_records,
)
from bio_diffusion_tpu.data.qm9 import parse_xyz_gdb9


def make_record(rng, n):
    """Synthesize a GDB9-format xyz record."""
    els = rng.choice(["H", "C", "N", "O", "F"], size=n)
    props = rng.normal(size=15)
    lines = [f"{n}", "gdb 42 " + " ".join(f"{p:.6f}" for p in props)]
    for e in els:
        x, y, z, q = rng.normal(size=4)
        # exercise the GDB9 "*^" exponent quirk occasionally
        xs = f"{x:.6f}" if rng.random() > 0.3 else f"{x:.4f}*^-2"
        lines.append(f"{e}\t{xs}\t{y:.6f}\t{z:.6f}\t{q:.4f}")
    lines.append("100.5 2500.25 3001.0")  # frequencies
    lines.append("InChI=1S/stub")
    return ("\n".join(lines) + "\n").encode(), els


def test_native_parser_matches_python(rng):
    if not native_available():
        pytest.skip("native lib unavailable (g++ missing)")
    records = []
    for _ in range(20):
        rec, _ = make_record(rng, int(rng.integers(3, 29)))
        records.append(rec)

    out = parse_gdb9_records(records, max_atoms=29)
    assert (out["num_atoms"] > 0).all()

    for i, rec in enumerate(records):
        mol = parse_xyz_gdb9(rec.decode().splitlines(keepends=True))
        n = int(mol["num_atoms"])
        assert out["num_atoms"][i] == n
        assert np.allclose(out["positions"][i, :n], mol["positions"], atol=1e-9)
        assert np.array_equal(out["charges"][i, :n], mol["charges"])
        for k in ("mu", "alpha", "homo", "U0", "Cv", "index"):
            assert np.isclose(out[k][i], float(mol[k]), atol=1e-9), k
        assert np.isclose(out["omega1"][i], 3001.0)


def test_native_collate_matches_numpy(rng):
    if not native_available():
        pytest.skip("native lib unavailable")
    m, n_src, n_pad = 10, 12, 16
    species = np.array([1, 6, 7, 8, 9], np.int64)
    charges = np.zeros((m, n_src), np.int64)
    positions = np.zeros((m, n_src, 3))
    for i in range(m):
        n = rng.integers(3, n_src + 1)
        charges[i, :n] = rng.choice(species, n)
        positions[i, :n] = rng.normal(size=(n, 3))
    sel = rng.permutation(m)[:4].astype(np.int64)

    x, one_hot, ch, mask = collate_dense_native(positions, charges, sel, n_pad, species)
    for bi, src in enumerate(sel):
        real = charges[src] > 0
        n = real.sum()
        assert mask[bi, :n].sum() == n and mask[bi].sum() == n
        assert np.allclose(x[bi, :n], positions[src][real], atol=1e-6)
        assert np.array_equal(one_hot[bi, :n].argmax(-1),
                              np.searchsorted(species, charges[src][real]))
        assert np.abs(x[bi, n:]).max() == 0
