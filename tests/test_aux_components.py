"""Tests for auxiliary components: protein features, pocket metadata,
visualization, analysis aggregation, config loader."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_protein_features_shapes(key):
    from bio_diffusion_tpu.data.protein_features import (
        dihedrals, masked_knn_graph, masked_radius_graph, positional_embeddings, rbf, sidechains,
    )

    rng = np.random.default_rng(0)
    n_res = 6
    x = jnp.asarray(rng.normal(size=(n_res, 3, 3)).astype(np.float32))
    d = dihedrals(x)
    assert d.shape == (n_res, 6)
    assert np.isfinite(np.asarray(d)).all()

    sc = sidechains(x)
    assert sc.shape == (n_res, 3)
    # unit-ish vectors
    assert np.allclose(np.linalg.norm(np.asarray(sc), axis=-1), 1.0, atol=1e-4)

    e = rbf(jnp.asarray([0.0, 10.0, 20.0]))
    assert e.shape == (3, 16)

    pe = positional_embeddings(jnp.asarray([-2.0, 0.0, 5.0]))
    assert pe.shape == (3, 16)

    # masked knn: nearest neighbors only among valid nodes, no self
    pts = jnp.asarray([[0, 0, 0], [1, 0, 0], [2, 0, 0], [50, 0, 0]], dtype=jnp.float32)
    mask = jnp.asarray([1, 1, 1, 0], dtype=jnp.float32)
    idx, m = masked_knn_graph(pts, mask, k=2)
    assert idx.shape == (4, 2) and m.shape == (4, 2)
    assert set(np.asarray(idx[0])) == {1, 2}  # node 3 masked out
    assert np.asarray(m)[0].sum() == 2

    idx_r, m_r = masked_radius_graph(pts, mask, radius=1.5, max_neighbors=3)
    assert np.asarray(m_r)[0].sum() == 1  # only node 1 within 1.5 of node 0


def test_pocket_metadata_and_batching(rng):
    from bio_diffusion_tpu.data.pocket import (
        JointLigandPocketBatch, get_pocket_dataset_info, sample_joint_sizes,
    )

    for name in ("bindingmoad", "crossdock", "crossdock_full"):
        info = get_pocket_dataset_info(name)
        assert "atom_encoder" in info and "aa_encoder" in info
        assert np.asarray(info["n_nodes"]).ndim == 2
        assert np.asarray(info["bonds1"]).shape[0] == len(info["atom_decoder"])

    lig, pock = sample_joint_sizes("crossdock", 32, rng)
    assert lig.shape == (32,) and pock.shape == (32,)
    assert (lig > 0).all() and (pock > 0).all()

    b, nl, npk = 2, 5, 7
    batch = JointLigandPocketBatch(
        ligand_x=rng.normal(size=(b, nl, 3)),
        ligand_one_hot=np.eye(4)[rng.integers(0, 4, (b, nl))],
        ligand_mask=np.ones((b, nl)),
        pocket_x=rng.normal(size=(b, npk, 3)),
        pocket_one_hot=np.eye(6)[rng.integers(0, 6, (b, npk))],
        pocket_mask=np.ones((b, npk)),
    )
    dense = batch.as_dense_batch()
    assert dense.x.shape == (b, nl + npk, 3)
    assert dense.one_hot.shape == (b, nl + npk, 10)
    assert batch.fixed_mask[:, :nl].sum() == 0
    assert batch.fixed_mask[:, nl:].sum() == b * npk


def test_visualization_roundtrip(tmp_path, rng):
    from bio_diffusion_tpu.chem.molecule import save_xyz_files
    from bio_diffusion_tpu.chem.visualization import save_chain_frames, visualize_chain, visualize_mols
    from bio_diffusion_tpu.data.dataset_info import QM9_WITH_H

    n = 5
    pos = rng.normal(size=(2, n, 3)) * 1.5
    one_hot = np.eye(5)[rng.integers(0, 5, (2, n))]
    mask = np.ones((2, n))
    save_xyz_files(str(tmp_path), pos, one_hot, mask, QM9_WITH_H)
    pngs = visualize_mols(str(tmp_path), QM9_WITH_H, max_num=2)
    assert len(pngs) == 2 and all(os.path.exists(p) for p in pngs)

    chain_dir = tmp_path / "chain"
    frames = rng.normal(size=(8, n, 9))
    save_chain_frames(frames, mask[0], QM9_WITH_H, str(chain_dir), keep_frames=4)
    gif = visualize_chain(str(chain_dir), QM9_WITH_H)
    assert gif and os.path.exists(gif)


def test_inference_aggregation(tmp_path):
    from bio_diffusion_tpu.analysis.inference_analysis import (
        aggregate_eval_results, calculate_mean_and_conf_int,
    )

    mean, (lo, hi) = calculate_mean_and_conf_int([1.0, 2.0, 3.0])
    assert np.isclose(mean, 2.0) and lo < 2.0 < hi

    for i, v in enumerate([0.9, 0.92, 0.88]):
        with open(tmp_path / f"run{i}.json", "w") as f:
            json.dump({"mol_stable": v, "validity": 0.95}, f)
    agg = aggregate_eval_results([str(tmp_path / f"run{i}.json") for i in range(3)])
    assert np.isclose(agg["mol_stable"]["mean"], 0.9, atol=0.01)
    assert agg["validity"]["n"] == 3


def test_config_loader_composition():
    from bio_diffusion_tpu.config.loader import default_config_dir, load_config

    cfg = load_config(default_config_dir(), "train", ["experiment=qm9_mol_gen_ddpm"])
    assert cfg["model"]["model_cfg"]["num_encoder_layers"] == 9
    assert cfg["model"]["diffusion_cfg"]["num_timesteps"] == 1000
    assert cfg["trainer"]["min_epochs"] == 1000  # experiment override applied
    assert cfg["datamodule"]["dataloader_cfg"]["dataset"] == "QM9"
    # interpolation: check_val_every_n_epoch follows eval_epochs
    assert cfg["trainer"]["check_val_every_n_epoch"] == cfg["model"]["diffusion_cfg"]["eval_epochs"]

    cfg2 = load_config(
        default_config_dir(), "train",
        ["experiment=geom_mol_gen_ddpm", "model.model_cfg.num_encoder_layers=5"],
    )
    assert cfg2["datamodule"]["dataloader_cfg"]["dataset"] == "GEOM"
    assert cfg2["model"]["model_cfg"]["num_encoder_layers"] == 5

    cfg3 = load_config(default_config_dir(), "train", ["experiment=qm9_mol_gen_conditional_ddpm"])
    assert cfg3["model"]["module_cfg"]["conditioning"] == ["alpha"]
    assert cfg3["datamodule"]["dataloader_cfg"]["include_charges"] is False


def test_dump_computation_graph(tmp_path):
    import jax.numpy as jnp

    from bio_diffusion_tpu.utils.profiling import dump_computation_graph

    paths = dump_computation_graph(
        lambda x: jnp.tanh(x) @ x.T, (jnp.ones((4, 8)),), str(tmp_path)
    )
    jaxpr = open(paths["jaxpr"]).read()
    hlo = open(paths["hlo"]).read()
    assert "tanh" in jaxpr and len(hlo) > 100
