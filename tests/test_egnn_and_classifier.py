"""Tests for the EGNN ablation denoiser, the property classifier, and GEOM data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from bio_diffusion_tpu.config.schema import (
    DataloaderConfig, DiffusionConfig, LayerConfig, ModelConfig, ModuleConfig,
)
from bio_diffusion_tpu.models.classifier import EGNNClassifier
from bio_diffusion_tpu.models.egnn import EGNNDynamics
from bio_diffusion_tpu.ops.geometry import centralize


def test_egnn_dynamics_shapes_and_equivariance(key):
    net = EGNNDynamics(
        model_cfg=ModelConfig(h_hidden_dim=16, e_hidden_dim=8, num_encoder_layers=2),
        module_cfg=ModuleConfig(),
        layer_cfg=LayerConfig(),
        diffusion_cfg=DiffusionConfig(num_timesteps=10, dynamics_network="egnn"),
        dataloader_cfg=DataloaderConfig(),
    )
    B, N = 2, 6
    mask = jnp.asarray(np.stack([np.ones(N), np.concatenate([np.ones(N - 2), np.zeros(2)])]),
                       dtype=jnp.float32)
    x = jax.random.normal(key, (B, N, 3)) * mask[..., None]
    _, x = centralize(x, mask)
    h = jax.random.normal(key, (B, N, 6)) * mask[..., None]
    xh = jnp.concatenate([x, h], -1)
    t = jnp.full((B, 1), 0.4)

    params = net.init(key, xh, t, mask)
    out = net.apply(params, xh, t, mask)
    assert out.shape == xh.shape

    R = jnp.asarray(Rotation.random(random_state=0).as_matrix(), dtype=jnp.float32)
    out_r = net.apply(params, jnp.concatenate([x @ R.T, h], -1), t, mask)
    assert np.allclose(np.asarray(out_r[..., :3]), np.asarray(out[..., :3] @ R.T), atol=1e-4)
    assert np.allclose(np.asarray(out_r[..., 3:]), np.asarray(out[..., 3:]), atol=1e-4)
    # masked + CoM-free velocity
    assert np.abs(np.asarray(out[..., :3]) * (1 - np.asarray(mask))[..., None]).max() == 0.0
    assert np.abs(np.asarray(out[..., :3]).sum(-2)).max() < 1e-4


def test_egnn_dynamics_in_diffusion(key):
    """The EGNN denoiser must be selectable through the build layer."""
    from bio_diffusion_tpu.config.build import build_evd, build_experiment

    cfg = {
        "model": {
            "model_cfg": {"h_hidden_dim": 16, "e_hidden_dim": 8, "num_encoder_layers": 1},
            "diffusion_cfg": {"num_timesteps": 5, "dynamics_network": "egnn"},
        },
        "datamodule": {"dataloader_cfg": {"dataset": "synthetic"}},
    }
    exp = build_experiment(cfg)
    evd = build_evd(exp)
    B, N = 2, 5
    mask = jnp.ones((B, N))
    x = jax.random.normal(key, (B, N, 3))
    _, x = centralize(x, mask)
    params = evd.init(key, x, jnp.zeros((B, N, 5)), jnp.zeros((B, N, 1)), mask, key, training=True)
    terms = evd.apply(params, x, jnp.zeros((B, N, 5)), jnp.zeros((B, N, 1)), mask, key, training=True)
    assert np.isfinite(np.asarray(terms["error_t"])).all()


def test_classifier_invariance_and_padding(key):
    model = EGNNClassifier(in_node_nf=5, hidden_nf=16, n_layers=2, attention=True, node_attr=1)
    B, N = 3, 7
    rng = np.random.default_rng(0)
    mask = np.zeros((B, N), np.float32)
    for b, n in enumerate([7, 5, 4]):
        mask[b, :n] = 1
    h0 = jax.nn.one_hot(jnp.asarray(rng.integers(0, 5, (B, N))), 5) * mask[..., None]
    x = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32)) * mask[..., None]
    params = model.init(key, h0, x, jnp.asarray(mask))
    pred = model.apply(params, h0, x, jnp.asarray(mask))
    assert pred.shape == (B,)

    # E(3) invariance of the prediction
    R = jnp.asarray(Rotation.random(random_state=1).as_matrix(), dtype=jnp.float32)
    pred_r = model.apply(params, h0, (x @ R.T) * mask[..., None], jnp.asarray(mask))
    assert np.allclose(np.asarray(pred_r), np.asarray(pred), atol=1e-4)

    # padding independence
    h0p = jnp.pad(h0, ((0, 0), (0, 3), (0, 0)))
    xp = jnp.pad(x, ((0, 0), (0, 3), (0, 0)))
    maskp = jnp.pad(jnp.asarray(mask), ((0, 0), (0, 3)))
    pred_p = model.apply(params, h0p, xp, maskp)
    assert np.allclose(np.asarray(pred_p), np.asarray(pred), atol=1e-4)


def test_classifier_torch_roundtrip(key, tmp_path):
    """load_torch_classifier reads a torch-format state dict correctly."""
    torch = pytest.importorskip("torch")
    import pickle
    from argparse import Namespace

    from bio_diffusion_tpu.models.classifier import load_torch_classifier

    model = EGNNClassifier(in_node_nf=5, hidden_nf=8, n_layers=1, attention=True, node_attr=1)
    h0 = jnp.zeros((1, 4, 5))
    x = jnp.zeros((1, 4, 3))
    params = model.init(key, h0, x, jnp.ones((1, 4)))

    # export our params into a torch-style state dict
    from bio_diffusion_tpu.train.torch_import import flatten_params

    sd = {}
    for path, arr in flatten_params(params["params"]).items():
        parts = path.split("/")
        name_parts = []
        for p in parts[:-1]:
            if "_" in p and p.rsplit("_", 1)[-1].isdigit() and p.rsplit("_", 1)[0] in (
                "edge_mlp", "node_mlp", "att_mlp", "node_dec", "graph_dec"
            ):
                base, idx = p.rsplit("_", 1)
                name_parts.extend([base, idx])
            else:
                name_parts.append(p)
        leaf = parts[-1]
        arr = np.asarray(arr)
        if leaf == "kernel":
            leaf, arr = "weight", arr.T
        sd[".".join(name_parts + [leaf])] = torch.tensor(arr)

    with open(tmp_path / "args.pickle", "wb") as f:
        pickle.dump(Namespace(nf=8, n_layers=1, attention=True, node_attr=1, device="cpu"), f)
    torch.save(sd, tmp_path / "best_checkpoint.npy")

    model2, params2 = load_torch_classifier(str(tmp_path))
    rng = np.random.default_rng(1)
    h0 = jax.nn.one_hot(jnp.asarray(rng.integers(0, 5, (2, 6))), 5)
    x = jnp.asarray(rng.normal(size=(2, 6, 3)).astype(np.float32))
    mask = jnp.ones((2, 6))
    p1 = model.apply(params, h0, x, mask)
    p2 = model2.apply(params2, h0, x, mask)
    assert np.allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)


def test_geom_dense_conversion(tmp_path):
    """GEOM split + dense conversion from a synthetic stacked conformer file."""
    from bio_diffusion_tpu.data.geom import load_split_data, _to_dense

    rng = np.random.default_rng(0)
    rows = []
    for mol_id in range(20):
        n = rng.integers(4, 12)
        z = rng.choice([1, 6, 7, 8], size=n)
        xyz = rng.normal(size=(n, 3))
        rows.append(np.column_stack([np.full(n, mol_id), z, xyz]))
    arr = np.vstack(rows)
    fpath = tmp_path / "GEOM_drugs_30.npy"
    np.save(fpath, arr)

    splits = load_split_data(str(fpath))
    assert set(splits) == {"train", "valid", "test"}
    assert len(splits["valid"]) == 2 and len(splits["test"]) == 2 and len(splits["train"]) == 16

    ds = _to_dense(splits["train"], remove_h=False)
    assert ds.data["one_hot"].shape[-1] == 16  # GEOM atom types
    # one-hot consistent with charges via atomic_nb
    from bio_diffusion_tpu.data.dataset_info import GEOM_WITH_H

    atomic_nb = np.asarray(GEOM_WITH_H["atomic_nb"])
    i = 0
    real = ds.data["charges"][i] > 0
    decoded = atomic_nb[ds.data["one_hot"][i][real].argmax(-1)]
    assert np.array_equal(decoded, ds.data["charges"][i][real])

    # permutation file persisted & reused
    splits2 = load_split_data(str(fpath))
    assert np.array_equal(splits2["train"][0], splits["train"][0])
