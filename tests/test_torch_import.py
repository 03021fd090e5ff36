"""Round-trip test of the torch checkpoint importer name mapping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bio_diffusion_tpu.config.schema import (
    DataloaderConfig, DiffusionConfig, LayerConfig, ModelConfig, ModuleConfig,
)
from bio_diffusion_tpu.models.diffusion import EquivariantVariationalDiffusion
from bio_diffusion_tpu.models.gcpnet import GCPNetDynamics
from bio_diffusion_tpu.ops.geometry import centralize
from bio_diffusion_tpu.train.torch_import import (
    export_state_dict,
    import_state_dict,
)


def build_params(key):
    dc = DiffusionConfig(num_timesteps=10)
    dl = DataloaderConfig()
    net = GCPNetDynamics(
        ModelConfig(h_hidden_dim=16, chi_hidden_dim=4, e_hidden_dim=8, xi_hidden_dim=2,
                    num_encoder_layers=2),
        ModuleConfig(), LayerConfig(), dc, dl, remat_interactions=False,
    )
    evd = EquivariantVariationalDiffusion(dynamics=net, diffusion_cfg=dc, dataloader_cfg=dl)
    B, N = 2, 6
    mask = jnp.ones((B, N))
    x = jax.random.normal(key, (B, N, 3))
    _, x = centralize(x, mask)
    params = evd.init(key, x, jnp.zeros((B, N, 5)), jnp.zeros((B, N, 1)), mask, key, training=True)
    return evd, params


def test_export_import_roundtrip(key):
    evd, params = build_params(key)
    sd = export_state_dict(params)
    # names look like the reference tree
    assert any(k.startswith("ddpm.dynamics_network.gcp_embedding") for k in sd)
    assert any(".interaction_layers.0.interaction.message_fusion.0." in k for k in sd)
    assert any(k.endswith("scalar_out.weight") for k in sd)
    # torch Linear layout: weight is [out, in]
    k_kernel = "ddpm.dynamics_network.gcp_embedding.node_embedding.vector_down.weight"
    assert k_kernel in sd and sd[k_kernel].shape[0] >= sd[k_kernel].shape[1]

    # perturb all weights, import back, check the tree leaves match
    sd2 = {k: v + 1.0 for k, v in sd.items()}
    imported = import_state_dict(sd2, params, strict=True)

    orig_leaves = jax.tree_util.tree_leaves_with_path(params)
    new_leaves = dict(
        (jax.tree_util.keystr(k), v) for k, v in jax.tree_util.tree_leaves_with_path(imported)
    )
    for path, leaf in orig_leaves:
        kstr = jax.tree_util.keystr(path)
        assert np.allclose(new_leaves[kstr], np.asarray(leaf) + 1.0), kstr


def test_import_strict_mismatch(key):
    evd, params = build_params(key)
    sd = export_state_dict(params)
    sd.pop(sorted(sd)[0])
    with pytest.raises(KeyError):
        import_state_dict(sd, params, strict=True)
    # non-strict fills missing from template
    out = import_state_dict(sd, params, strict=False)
    assert out is not None


def test_irrelevant_keys_skipped(key):
    evd, params = build_params(key)
    sd = export_state_dict(params)
    sd["ddpm.gamma.gamma"] = np.zeros(11)  # predefined schedule table
    sd["train_loss.value"] = np.zeros(1)  # torchmetrics state
    sd["ddpm.num_nodes_distribution.prob"] = np.zeros(3)
    out = import_state_dict(sd, params, strict=True)
    assert out is not None


def test_egnn_dynamics_roundtrip(key):
    """The EGNN dynamics param paths (egnn.mpnn_layers.<i>.edge_mlp.<j>...)
    must round-trip through the torch name mapping too."""
    from bio_diffusion_tpu.models.egnn import EGNNDynamics
    from bio_diffusion_tpu.models.diffusion import EquivariantVariationalDiffusion

    dc = DiffusionConfig(num_timesteps=10, dynamics_network="egnn")
    dl = DataloaderConfig()
    net = EGNNDynamics(
        model_cfg=ModelConfig(h_hidden_dim=16, e_hidden_dim=8, num_encoder_layers=2),
        module_cfg=ModuleConfig(), layer_cfg=LayerConfig(),
        diffusion_cfg=dc, dataloader_cfg=dl,
    )
    evd = EquivariantVariationalDiffusion(dynamics=net, diffusion_cfg=dc, dataloader_cfg=dl)
    B, N = 2, 6
    mask = jnp.ones((B, N))
    x = jax.random.normal(key, (B, N, 3))
    _, x = centralize(x, mask)
    params = evd.init(key, x, jnp.zeros((B, N, 5)), jnp.zeros((B, N, 1)), mask, key, training=True)

    sd = export_state_dict(params)
    assert any(".egnn.mpnn_layers.0.edge_mlp.0.weight" in k for k in sd), sorted(sd)[:5]
    sd2 = {k: v + 1.0 for k, v in sd.items()}
    imported = import_state_dict(sd2, params, strict=True)
    for (pa, la), (pb, lb) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(imported),
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        assert np.allclose(np.asarray(lb), np.asarray(la) + 1.0), jax.tree_util.keystr(pa)
