"""Tests for dense batching, synthetic data, and stability metrics."""

import numpy as np
import pytest

from bio_diffusion_tpu.chem.stability import (
    batch_molecular_stability,
    check_molecular_stability,
    ensure_bond_tables,
    get_bond_order,
    get_bond_order_batch,
    get_bond_length_arrays,
)
from bio_diffusion_tpu.data.batch import iterate_dense_batches, select_bucket
from bio_diffusion_tpu.data.dataset_info import QM9_WITH_H, GEOM_WITH_H, get_dataset_info
from bio_diffusion_tpu.data.synthetic import synthetic_qm9_like


def test_bond_order_known_molecules():
    # C-H at 1.09 A is a single bond; C=C at 1.34 double; C#C at 1.20 triple
    assert get_bond_order("C", "H", 1.09) == 1
    assert get_bond_order("C", "C", 1.34) == 2
    assert get_bond_order("C", "C", 1.19) == 3
    assert get_bond_order("C", "C", 3.0) == 0
    # H-H beyond 74+10 pm is no bond
    assert get_bond_order("H", "H", 0.9) == 0
    assert get_bond_order("H", "H", 0.74) == 1


def test_bond_order_batch_matches_scalar():
    info = ensure_bond_tables(dict(QM9_WITH_H))
    rng = np.random.default_rng(0)
    a1 = rng.integers(0, 5, 100)
    a2 = rng.integers(0, 5, 100)
    d = rng.uniform(0.5, 3.0, 100)
    batch_orders = get_bond_order_batch(a1, a2, d, info)
    decoder = info["atom_decoder"]
    for i in range(100):
        assert batch_orders[i] == get_bond_order(decoder[a1[i]], decoder[a2[i]], d[i]), i


def test_methane_is_stable():
    """CH4 with ideal geometry: C at origin, 4 H at ~1.09 A tetrahedral."""
    info = dict(QM9_WITH_H)
    d = 1.09 / np.sqrt(3)
    pos = np.array([
        [0.0, 0.0, 0.0],
        [d, d, d], [d, -d, -d], [-d, d, -d], [-d, -d, d],
    ])
    types = np.array([1, 0, 0, 0, 0])  # C, H, H, H, H
    stable, n_stable, n = check_molecular_stability(pos, types, info)
    assert stable and n_stable == 5 and n == 5

    # remove one H -> carbon valence 3 -> unstable C (H's remain stable)
    stable2, n_stable2, n2 = check_molecular_stability(pos[:4], types[:4], info)
    assert not stable2 and n_stable2 == 3 and n2 == 4


def test_batch_stability_matches_single():
    rng = np.random.default_rng(1)
    info = dict(QM9_WITH_H)
    B, N = 8, 12
    mask = np.zeros((B, N), bool)
    pos = np.zeros((B, N, 3))
    types = np.zeros((B, N), np.int64)
    for b in range(B):
        n = rng.integers(3, N + 1)
        mask[b, :n] = True
        pos[b, :n] = rng.normal(size=(n, 3)) * 1.5
        types[b, :n] = rng.integers(0, 5, n)
    ms, sa, na = batch_molecular_stability(pos, types, mask, info)
    for b in range(B):
        n = mask[b].sum()
        s1, a1, n1 = check_molecular_stability(pos[b, :n], types[b, :n], info)
        assert ms[b] == s1 and sa[b] == a1 and na[b] == n1


def test_geom_limits_bonds_to_one():
    info = dict(GEOM_WITH_H)
    # C=C distance would be order 2 for QM9 but GEOM limits to 1
    pos = np.array([[0.0, 0, 0], [1.34, 0, 0]])
    types = np.array([info["atom_encoder"]["C"]] * 2)
    _, n_stable, _ = check_molecular_stability(pos, types, info)
    # each C has 1 bond -> not valence 4 -> unstable, but order was capped at 1
    i = dict(ensure_bond_tables(info))
    orders = get_bond_order_batch(
        np.array([2]), np.array([2]), np.array([1.34]), i, limit_bonds_to_one=True
    )
    assert orders[0] == 1


def test_dataset_info_registry():
    assert get_dataset_info("QM9", False)["max_n_nodes"] == 29
    assert get_dataset_info("GEOM", False)["max_n_nodes"] == 181
    assert len(get_dataset_info("QM9", True)["atom_decoder"]) == 4
    with pytest.raises(ValueError):
        get_dataset_info("nope", False)


def test_iterate_dense_batches(rng):
    ds = synthetic_qm9_like(num_molecules=50, max_nodes=20, seed=0)
    batches = list(iterate_dense_batches(ds, batch_size=16, rng=rng, pad_to=20))
    assert len(batches) == 3  # drop_last
    b = batches[0]
    assert b.x.shape == (16, 20, 3)
    assert b.one_hot.shape == (16, 20, 5)
    # mask consistent with charges
    assert np.array_equal(np.asarray(b.node_mask), (np.asarray(b.charges[..., 0]) > 0))
    # padded rows zero
    assert np.abs(np.asarray(b.x) * (1 - np.asarray(b.node_mask))[..., None]).max() == 0

    # bucketed mode pads to multiple of 4
    batches = list(
        iterate_dense_batches(ds, batch_size=16, rng=rng, pad_to_multiple=4)
    )
    for b in batches:
        assert b.x.shape[1] % 4 == 0


def test_conditioning_context(rng):
    ds = synthetic_qm9_like(num_molecules=40, max_nodes=12, seed=1)
    norms = {"alpha": {"mean": 0.0, "mad": 1.0}}
    b = next(iterate_dense_batches(
        ds, batch_size=8, rng=rng, pad_to=12, conditioning=("alpha",), property_norms=norms
    ))
    assert b.context.shape == (8, 12, 1)
    # broadcast per graph and masked
    ctx = np.asarray(b.context)
    m = np.asarray(b.node_mask)
    for i in range(8):
        real = ctx[i][m[i] > 0]
        assert np.allclose(real, real[0])
    assert np.abs(ctx * (1 - m[..., None])).max() == 0


def test_select_bucket():
    assert select_bucket(19, None, 1) == 19
    assert select_bucket(19, None, 8) == 24
    assert select_bucket(45, (32, 64, 96), 1) == 64
    assert select_bucket(200, (32, 64, 96), 1) == 96
