"""Trainable fast path: FastGCPNetDynamics (adopted param tree) forward and
GRADIENT parity vs the module path, plus the custom-VJP Pallas message layer
(interpret mode) — VERDICT r1 item 5 (Pallas on the training path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bio_diffusion_tpu.config.schema import (
    DataloaderConfig, DiffusionConfig, LayerConfig, ModelConfig, ModuleConfig,
)
from bio_diffusion_tpu.models.diffusion import EquivariantVariationalDiffusion
from bio_diffusion_tpu.models.gcpnet import GCPNetDynamics
from bio_diffusion_tpu.models.gcpnet_fast import (
    FastGCPNetDynamics, make_message_layer_fn, message_layer_reference,
    pack_chain_weights_jnp, pack_gcp1_weights_jnp,
)
from bio_diffusion_tpu.ops.geometry import centralize


def _cfgs(num_layers=2):
    dc = DiffusionConfig(num_timesteps=10)
    dl = DataloaderConfig()
    mc = ModelConfig(h_hidden_dim=16, chi_hidden_dim=4, e_hidden_dim=8, xi_hidden_dim=2,
                     num_encoder_layers=num_layers)
    return mc, ModuleConfig(), LayerConfig(), dc, dl


def _inputs(key, b=3, n=7, f=6):
    k1, k2 = jax.random.split(key)
    node_mask = jnp.asarray(
        (jnp.arange(n)[None, :] < jnp.array([[5], [7], [6]])).astype(jnp.float32)
    )
    xh = jax.random.normal(k1, (b, n, 3 + f)) * node_mask[..., None]
    _, x = centralize(xh[..., :3], node_mask)
    xh = jnp.concatenate([x, xh[..., 3:]], -1)
    t = jax.random.uniform(k2, (b, 1))
    return xh, t, node_mask


@pytest.fixture(scope="module")
def setup():
    mc, mod, lcfg, dc, dl = _cfgs()
    module = GCPNetDynamics(mc, mod, lcfg, dc, dl, remat_interactions=False)
    xh, t, node_mask = _inputs(jax.random.PRNGKey(0))
    params = module.init(jax.random.PRNGKey(1), xh, t, node_mask)
    fast = FastGCPNetDynamics(mc, mod, lcfg, dc, dl, use_pallas=False)
    return module, fast, params, (xh, t, node_mask)


def test_adopted_tree_forward_parity(setup):
    """FastGCPNetDynamics applies with the module-path params unchanged and
    reproduces the forward to float tolerance."""
    module, fast, params, (xh, t, node_mask) = setup
    out_mod = module.apply(params, xh, t, node_mask)
    out_fast = fast.apply(params, xh, t, node_mask)
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_mod),
                               rtol=2e-5, atol=2e-6)


def test_adopted_tree_init_matches_structure(setup):
    """FastGCPNetDynamics.init produces the same tree structure as the
    module path (values differ only by rng folding)."""
    module, fast, params, (xh, t, node_mask) = setup
    p2 = fast.init(jax.random.PRNGKey(2), xh, t, node_mask)
    s1 = jax.tree_util.tree_structure(params)
    s2 = jax.tree_util.tree_structure(p2)
    assert s1 == s2
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        assert a.shape == b.shape


def test_gradient_parity_vs_module(setup):
    """d(loss)/d(params) matches between the module path and the trainable
    packed-layout path (XLA mode, f32)."""
    module, fast, params, (xh, t, node_mask) = setup

    def loss(p, net):
        out = net.apply(p, xh, t, node_mask)
        return jnp.sum(out ** 2)

    g_mod = jax.grad(lambda p: loss(p, module))(params)
    g_fast = jax.grad(lambda p: loss(p, fast))(params)
    flat_mod = jax.tree_util.tree_leaves_with_path(g_mod)
    flat_fast = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(g_fast)}
    assert len(flat_mod) == len(flat_fast)
    for path, gm in flat_mod:
        gf = flat_fast[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gm), rtol=5e-4, atol=5e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_custom_vjp_pallas_message_layer_interpret(setup):
    """Pallas (interpret) forward == jnp reference forward, and the custom
    VJP backward == AD through the reference."""
    module, fast, params, (xh, t, node_mask) = setup
    mc, mod, lcfg, dc, dl = _cfgs()

    # build packed inputs from a real forward's featurization
    from bio_diffusion_tpu.models.gcpnet_fast import (
        _build_epack, _featurize, _gcp2_apply_cm, _gcp2_edge_wide,
    )

    dyn = params["params"]
    f = _featurize(xh, t, node_mask, None, None, nx=3, dc=dc, mod=mod, n_cond=0,
                   cdt=jnp.float32)
    emb = dyn["gcp_embedding"]
    e_emb, xi_emb = _gcp2_edge_wide(emb["edge_embedding"], f["e_s"], f["ev_cm"],
                                    f["frames_flat"])
    h_emb, chi_emb = _gcp2_apply_cm(emb["node_embedding"], f["h"], f["chi_cm"],
                                    f["f_node_c"], scalar_act=False, gate_act=None)
    b, n = f["b"], f["n"]
    epack = _build_epack(e_emb, xi_emb, f["frames_flat"], f["edge_mask"], b, n,
                         mc.xi_hidden_dim, jnp.float32)
    mp = dyn["interaction_layers_0"]["interaction"]
    g1 = pack_gcp1_weights_jnp(mp["message_fusion_0"], mc.h_hidden_dim,
                               mc.chi_hidden_dim, mc.xi_hidden_dim, jnp.float32)
    chain = pack_chain_weights_jnp(mp, lcfg.mp_cfg.num_message_layers, jnp.float32)
    s_node = h_emb
    v_node = chi_emb.reshape(b, n, 3 * mc.chi_hidden_dim)

    ref_fn = make_message_layer_fn(mc.xi_hidden_dim, use_pallas=False)
    pal_fn = make_message_layer_fn(mc.xi_hidden_dim, use_pallas=True, interpret=True)

    s_ref, v_ref = ref_fn(s_node, v_node, epack, g1, chain)
    s_pal, v_pal = pal_fn(s_node, v_node, epack, g1, chain)
    np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_ref), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(v_pal), np.asarray(v_ref), rtol=2e-5, atol=2e-6)

    def scal(fn):
        def g(s, v, e, g1_, ch):
            a, bb = fn(s, v, e, g1_, ch)
            return jnp.sum(a ** 2) + jnp.sum(bb ** 2)
        return g

    g_ref = jax.grad(scal(ref_fn), argnums=(0, 1, 2))(s_node, v_node, epack, g1, chain)
    g_pal = jax.grad(scal(pal_fn), argnums=(0, 1, 2))(s_node, v_node, epack, g1, chain)
    for a, b_ in zip(jax.tree.leaves(g_pal), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5)


def test_evd_train_step_with_fast_dynamics(setup):
    """EVD cloned with FastGCPNetDynamics trains on the SAME param tree:
    one step runs, loss finite, param tree structure preserved."""
    import optax

    from bio_diffusion_tpu.config.schema import OptimizerConfig
    from bio_diffusion_tpu.data.batch import iterate_dense_batches
    from bio_diffusion_tpu.data.synthetic import synthetic_qm9_like
    from bio_diffusion_tpu.models.distributions import NumNodesDistribution
    from bio_diffusion_tpu.train.state import create_train_state, make_optimizer
    from bio_diffusion_tpu.train.step import make_train_step

    mc, mod, lcfg, dc, dl = _cfgs()
    module = GCPNetDynamics(mc, mod, lcfg, dc, dl, remat_interactions=False)
    evd = EquivariantVariationalDiffusion(dynamics=module, diffusion_cfg=dc,
                                          dataloader_cfg=dl)
    fast = FastGCPNetDynamics(mc, mod, lcfg, dc, dl, use_pallas=False)
    evd_fast = evd.clone(dynamics=fast)

    ds = synthetic_qm9_like(num_molecules=8, max_nodes=8, seed=0)
    rng = np.random.default_rng(0)
    batch = next(iterate_dense_batches(ds, batch_size=8, rng=rng, shuffle=False, pad_to=8))
    key = jax.random.PRNGKey(0)
    _, x0 = centralize(jnp.asarray(batch.x), jnp.asarray(batch.node_mask))
    params = evd.init(key, x0, jnp.asarray(batch.one_hot), jnp.asarray(batch.charges),
                      jnp.asarray(batch.node_mask), key, training=True)

    hist = {int(n): int(c) for n, c in zip(*np.unique(ds.data["num_atoms"], return_counts=True))}
    nodes_dist = NumNodesDistribution(hist)
    opt = make_optimizer(OptimizerConfig())
    step = make_train_step(evd_fast, opt, dc, dl, nodes_dist.log_prob_table, donate=False)
    state = create_train_state(params, opt)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert jax.tree_util.tree_structure(new_state.params) == jax.tree_util.tree_structure(params)


def test_pallas_bwd_kernel_interpret(setup):
    """Handwritten Pallas backward kernel (interpret) vs AD through the jnp
    reference: input grads, epack grads, and ALL weight grads."""
    module, fast, params, (xh, t, node_mask) = setup
    mc, mod, lcfg, dc, dl = _cfgs()

    from bio_diffusion_tpu.models.gcpnet_fast import (
        _build_epack, _featurize, _gcp2_apply_cm, _gcp2_edge_wide,
    )
    from bio_diffusion_tpu.ops.pallas.gcp_kernel import fused_message_layer_bwd

    dyn = params["params"]
    f = _featurize(xh, t, node_mask, None, None, nx=3, dc=dc, mod=mod, n_cond=0,
                   cdt=jnp.float32)
    emb = dyn["gcp_embedding"]
    e_emb, xi_emb = _gcp2_edge_wide(emb["edge_embedding"], f["e_s"], f["ev_cm"],
                                    f["frames_flat"])
    h_emb, chi_emb = _gcp2_apply_cm(emb["node_embedding"], f["h"], f["chi_cm"],
                                    f["f_node_c"], scalar_act=False, gate_act=None)
    b, n = f["b"], f["n"]
    epack = _build_epack(e_emb, xi_emb, f["frames_flat"], f["edge_mask"], b, n,
                         mc.xi_hidden_dim, jnp.float32)
    mp = dyn["interaction_layers_0"]["interaction"]
    g1 = pack_gcp1_weights_jnp(mp["message_fusion_0"], mc.h_hidden_dim,
                               mc.chi_hidden_dim, mc.xi_hidden_dim, jnp.float32)
    chain = pack_chain_weights_jnp(mp, lcfg.mp_cfg.num_message_layers, jnp.float32)
    s_node = h_emb
    v_node = chi_emb.reshape(b, n, 3 * mc.chi_hidden_dim)

    ref_fn = make_message_layer_fn(mc.xi_hidden_dim, use_pallas=False)

    def loss(s, v, e, g1_, ch):
        a, bb = ref_fn(s, v, e, g1_, ch)
        return jnp.sum(a ** 2) + jnp.sum(bb ** 2)

    grads_ref = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(s_node, v_node, epack, g1, chain)

    # cotangents of the quadratic loss at the primal outputs
    s_agg, v_agg = ref_fn(s_node, v_node, epack, g1, chain)
    ct = (2.0 * s_agg, 2.0 * v_agg)
    out = fused_message_layer_bwd(
        s_node, v_node, epack, g1, chain, ct, ve_dim=mc.xi_hidden_dim, interpret=True,
    )
    d_sn, d_vn, d_ep, d_g1, d_chain = out

    np.testing.assert_allclose(np.asarray(d_sn), np.asarray(grads_ref[0]),
                               rtol=5e-4, atol=1e-5, err_msg="d_s_node")
    np.testing.assert_allclose(np.asarray(d_vn), np.asarray(grads_ref[1]),
                               rtol=5e-4, atol=1e-5, err_msg="d_v_node")
    np.testing.assert_allclose(np.asarray(d_ep), np.asarray(grads_ref[2]),
                               rtol=5e-4, atol=1e-5, err_msg="d_epack")
    for key in d_g1:
        np.testing.assert_allclose(
            np.asarray(d_g1[key]), np.asarray(grads_ref[3][key]),
            rtol=1e-3, atol=1e-5, err_msg=f"d_g1[{key}]",
        )
    for i, (a, b_) in enumerate(zip(d_chain, grads_ref[4])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-5, err_msg=f"d_chain[{i}]")


def test_full_grad_parity_pallas_bwd_interpret(setup):
    """End-to-end trainable forward with Pallas fwd + Pallas bwd (interpret)
    matches module-path gradients."""
    module, _, params, (xh, t, node_mask) = setup
    mc, mod, lcfg, dc, dl = _cfgs()
    fast_pl = FastGCPNetDynamics(mc, mod, lcfg, dc, dl, use_pallas=True, interpret=True)

    def loss(p, net):
        out = net.apply(p, xh, t, node_mask)
        return jnp.sum(out ** 2)

    g_mod = jax.grad(lambda p: loss(p, module))(params)
    g_pl = jax.grad(lambda p: loss(p, fast_pl))(params)
    for (path, gm), gp in zip(jax.tree_util.tree_leaves_with_path(g_mod),
                              jax.tree.leaves(g_pl)):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gm), rtol=2e-3, atol=2e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_shard_map_pallas_matches_packed_xla_under_mesh():
    """VERDICT r2 #5: the Pallas message layer runs per-shard under
    jax.shard_map on a data-only mesh (kernel in interpret mode on the
    virtual CPU mesh) and the loss AND parameter gradients match the
    GSPMD packed-XLA path."""
    from bio_diffusion_tpu.parallel.mesh import batch_sharding, make_mesh

    mc, mod, lcfg, dc, dl = _cfgs()
    mesh = make_mesh(data=8, model=1)

    module = GCPNetDynamics(mc, mod, lcfg, dc, dl, remat_interactions=False)
    b, n, f = 8, 6, 6
    key = jax.random.PRNGKey(3)
    sizes = jnp.array([4, 6, 5, 3, 6, 4, 5, 6])[:, None]
    node_mask = (jnp.arange(n)[None, :] < sizes).astype(jnp.float32)
    xh = jax.random.normal(key, (b, n, 3 + f)) * node_mask[..., None]
    _, x = centralize(xh[..., :3], node_mask)
    xh = jnp.concatenate([x, xh[..., 3:]], -1)
    t = jax.random.uniform(jax.random.PRNGKey(4), (b, 1))
    params = module.init(jax.random.PRNGKey(1), xh, t, node_mask)

    fast_xla = FastGCPNetDynamics(mc, mod, lcfg, dc, dl, use_pallas=False)
    fast_sm = FastGCPNetDynamics(
        mc, mod, lcfg, dc, dl, use_pallas=True, interpret=True, mesh=mesh,
    )

    bs = batch_sharding(mesh)
    xh_s = jax.device_put(xh, bs)
    t_s = jax.device_put(t, bs)
    mask_s = jax.device_put(node_mask, bs)

    def loss(p, net, *args):
        return jnp.sum(net.apply(p, *args) ** 2)

    l_xla, g_xla = jax.jit(
        lambda p: jax.value_and_grad(loss)(p, fast_xla, xh_s, t_s, mask_s)
    )(params)
    l_sm, g_sm = jax.jit(
        lambda p: jax.value_and_grad(loss)(p, fast_sm, xh_s, t_s, mask_s)
    )(params)

    np.testing.assert_allclose(float(l_sm), float(l_xla), rtol=1e-5)
    flat_xla = jax.tree_util.tree_leaves_with_path(g_xla)
    flat_sm = {jax.tree_util.keystr(k): v
               for k, v in jax.tree_util.tree_leaves_with_path(g_sm)}
    for path, gx in flat_xla:
        gs = flat_sm[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gx), rtol=5e-4, atol=5e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_shard_map_mesh_handles_ragged_batch():
    """A batch whose leading dim does not divide the mesh's data axis (the
    drop_last=False final validation batch, replicated by Trainer._shard)
    must NOT crash the mesh-bound Pallas path — it dispatches to the
    GSPMD-partitionable packed-XLA layer at trace time and matches it."""
    from bio_diffusion_tpu.parallel.mesh import make_mesh

    mc, mod, lcfg, dc, dl = _cfgs()
    mesh = make_mesh(data=8, model=1)

    fast_xla = FastGCPNetDynamics(mc, mod, lcfg, dc, dl, use_pallas=False)
    fast_sm = FastGCPNetDynamics(
        mc, mod, lcfg, dc, dl, use_pallas=True, interpret=True, mesh=mesh,
    )

    b, n, f = 3, 6, 6  # 3 % 8 != 0: ragged
    key = jax.random.PRNGKey(7)
    sizes = jnp.array([4, 6, 5])[:, None]
    node_mask = (jnp.arange(n)[None, :] < sizes).astype(jnp.float32)
    xh = jax.random.normal(key, (b, n, 3 + f)) * node_mask[..., None]
    _, x = centralize(xh[..., :3], node_mask)
    xh = jnp.concatenate([x, xh[..., 3:]], -1)
    t = jax.random.uniform(jax.random.PRNGKey(8), (b, 1))
    module = GCPNetDynamics(mc, mod, lcfg, dc, dl, remat_interactions=False)
    params = module.init(jax.random.PRNGKey(1), xh, t, node_mask)

    with mesh:
        out_sm = jax.jit(fast_sm.apply)(params, xh, t, node_mask)
        out_xla = jax.jit(fast_xla.apply)(params, xh, t, node_mask)
    np.testing.assert_allclose(
        np.asarray(out_sm), np.asarray(out_xla), rtol=1e-5, atol=1e-6
    )


def test_mesh_sampling_matches_single_device():
    """Multi-chip data-parallel SAMPLING (the reference has no inference
    scale-out): a SegmentedSampler bound to an 8-device mesh — baked Pallas
    path per-shard under shard_map (interpret mode), everything else GSPMD-
    partitioned from the sharded batch inputs — produces the same molecules
    as the single-device sampler, for both a divisible batch (B=8, kernel
    per shard) and a ragged batch (B=6, packed-XLA dispatch)."""
    from bio_diffusion_tpu.models.diffusion import EquivariantVariationalDiffusion
    from bio_diffusion_tpu.models.gcpnet import GCPNetDynamics
    from bio_diffusion_tpu.parallel.mesh import make_mesh
    from bio_diffusion_tpu.train.sampling import SegmentedSampler

    mc, mod, lcfg, dc, dl = _cfgs()
    module = GCPNetDynamics(mc, mod, lcfg, dc, dl, remat_interactions=False)
    evd = EquivariantVariationalDiffusion(
        dynamics=module, diffusion_cfg=dc, dataloader_cfg=dl
    )

    key = jax.random.PRNGKey(0)
    b, n = 8, 6
    sizes = jnp.array([4, 6, 5, 3, 6, 4, 5, 6])[:, None]
    node_mask = (jnp.arange(n)[None, :] < sizes).astype(jnp.float32)
    x0 = jax.random.normal(key, (b, n, 3)) * node_mask[..., None]
    _, x0 = centralize(x0, node_mask)
    oh = jax.nn.one_hot(jax.random.randint(key, (b, n), 0, 5), 5) * node_mask[..., None]
    ch = jnp.ones((b, n, 1)) * node_mask[..., None]
    params = evd.init(key, x0, oh, ch, node_mask, key, training=True)

    single = SegmentedSampler(evd, params, segment_size=4, fast="on", interpret=True)
    meshed = SegmentedSampler(evd, params, segment_size=4, fast="on", interpret=True,
                              mesh=make_mesh(data=8, model=1))
    assert single.params == {} and meshed.params == {}, "fast path not engaged"

    # divisible batch: shard_map kernel per shard, exact same RNG stream
    xh_s = single.run(jax.random.PRNGKey(9), node_mask)
    xh_m = meshed.run(jax.random.PRNGKey(9), node_mask)
    np.testing.assert_allclose(xh_m, xh_s, rtol=1e-5, atol=1e-6,
                               err_msg="mesh sampling mismatch at batch 8")

    # ragged batch (B=6): run() pads with copies of molecule 0 up to the
    # device multiple and slices back — identical to a single-device run of
    # that same padded batch
    m6 = node_mask[:6]
    padded = jnp.concatenate([m6, jnp.tile(m6[:1], (2, 1))], axis=0)
    xh_m6 = meshed.run(jax.random.PRNGKey(9), m6)
    xh_ref = single.run(jax.random.PRNGKey(9), padded)[:6]
    assert xh_m6.shape[0] == 6
    np.testing.assert_allclose(xh_m6, xh_ref, rtol=1e-5, atol=1e-6,
                               err_msg="mesh sampling mismatch at ragged batch 6")


def test_learned_schedule_fast_sampler_matches_module():
    """A LEARNED GammaNetwork schedule no longer blocks the fast inference
    path: build_fast_evd freezes gamma into a k/T lookup table (sampling
    only queries the grid), and the baked sampler reproduces the module
    path's samples."""
    from bio_diffusion_tpu.models.diffusion import EquivariantVariationalDiffusion
    from bio_diffusion_tpu.models.gcpnet import GCPNetDynamics
    from bio_diffusion_tpu.train.sampling import SegmentedSampler

    mc, mod, lcfg, dc, dl = _cfgs()
    dc = DiffusionConfig(num_timesteps=10, noise_schedule="learned", loss_type="vlb")
    module = GCPNetDynamics(mc, mod, lcfg, dc, dl, remat_interactions=False)
    evd = EquivariantVariationalDiffusion(
        dynamics=module, diffusion_cfg=dc, dataloader_cfg=dl
    )

    key = jax.random.PRNGKey(2)
    b, n = 4, 6
    sizes = jnp.array([4, 6, 5, 3])[:, None]
    node_mask = (jnp.arange(n)[None, :] < sizes).astype(jnp.float32)
    x0 = jax.random.normal(key, (b, n, 3)) * node_mask[..., None]
    _, x0 = centralize(x0, node_mask)
    oh = jax.nn.one_hot(jax.random.randint(key, (b, n), 0, 5), 5) * node_mask[..., None]
    ch = jnp.ones((b, n, 1)) * node_mask[..., None]
    params = evd.init(key, x0, oh, ch, node_mask, key, training=True)
    assert "gamma" in params["params"], "learned schedule params missing"

    fast = SegmentedSampler(evd, params, segment_size=4, fast="on", interpret=True)
    assert fast.params == {}, "fast path not engaged for the learned schedule"
    slow = SegmentedSampler(evd, params, segment_size=4, fast="off")

    # gamma at the grid is IDENTICAL (same apply); the residual diff is
    # fast-vs-module float noise amplified through the reverse trajectory
    # of an untrained model (values ~1e4 after 10 steps)
    xh_f = fast.run(jax.random.PRNGKey(11), node_mask)
    xh_s = slow.run(jax.random.PRNGKey(11), node_mask)
    np.testing.assert_allclose(xh_f, xh_s, rtol=1e-2, atol=1e-4)
    # and the frozen table itself matches the learned gamma exactly
    t_grid = jnp.arange(11, dtype=jnp.float32)[:, None] / 10.0
    g_net = np.asarray(evd.apply(params, t_grid, method=evd.gamma))[:, 0]
    g_tab = np.asarray(fast.evd.gamma_table_override)
    np.testing.assert_allclose(g_tab, g_net, rtol=1e-7)


def test_learned_schedule_fast_sampler_off_grid(key):
    """VERDICT r3 #9: sampling with ``num_timesteps`` NOT dividing T on a
    learned schedule queries gamma OFF the k/T grid.  The frozen table
    linearly interpolates (diffusion.py gamma_table_override branch) while the
    module path evaluates the GammaNetwork continuously — bound both the raw
    gamma interpolation error and the end-to-end trajectory deviation."""
    from bio_diffusion_tpu.models.diffusion import EquivariantVariationalDiffusion
    from bio_diffusion_tpu.models.gcpnet import GCPNetDynamics
    from bio_diffusion_tpu.train.sampling import SegmentedSampler

    mc, mod, lcfg, dc, dl = _cfgs()
    T = 10
    dc = DiffusionConfig(num_timesteps=T, noise_schedule="learned", loss_type="vlb")
    module = GCPNetDynamics(mc, mod, lcfg, dc, dl, remat_interactions=False)
    evd = EquivariantVariationalDiffusion(
        dynamics=module, diffusion_cfg=dc, dataloader_cfg=dl
    )

    b, n = 4, 6
    sizes = jnp.array([4, 6, 5, 3])[:, None]
    node_mask = (jnp.arange(n)[None, :] < sizes).astype(jnp.float32)
    x0 = jax.random.normal(key, (b, n, 3)) * node_mask[..., None]
    _, x0 = centralize(x0, node_mask)
    oh = jax.nn.one_hot(jax.random.randint(key, (b, n), 0, 5), 5) * node_mask[..., None]
    ch = jnp.ones((b, n, 1)) * node_mask[..., None]
    params = evd.init(key, x0, oh, ch, node_mask, key, training=True)

    fast = SegmentedSampler(evd, params, segment_size=7, fast="on", interpret=True)
    slow = SegmentedSampler(evd, params, segment_size=7, fast="off")

    # (a) raw gamma: off-grid queries (k/7 for T=10) through the table's
    # linear interpolation vs the continuous GammaNetwork.  The untrained
    # network's positive-output monotone parametrization is near-piecewise
    # -linear at T=10 grid spacing, so the interpolation error is small
    # relative to the table's dynamic range.
    t_off = jnp.arange(8, dtype=jnp.float32)[:, None] / 7.0
    g_net = np.asarray(evd.apply(params, t_off, method=evd.gamma))[:, 0]
    g_tab = np.asarray(fast.evd.apply({}, t_off, method=fast.evd.gamma))[:, 0]
    span = float(np.ptp(np.asarray(fast.evd.gamma_table_override)))
    assert np.max(np.abs(g_tab - g_net)) < 0.02 * max(span, 1e-6), (
        f"off-grid gamma interpolation error {np.max(np.abs(g_tab - g_net)):.3e} "
        f"exceeds 2% of the table's range {span:.3e}"
    )

    # (b) end-to-end: a 7-step reverse trajectory (7 does not divide 10)
    # from both samplers, identical keys.  Same tolerance class as the
    # on-grid test — interpolation must not blow past float noise.
    xh_f = fast.run(jax.random.PRNGKey(11), node_mask, num_timesteps=7)
    xh_s = slow.run(jax.random.PRNGKey(11), node_mask, num_timesteps=7)
    np.testing.assert_allclose(xh_f, xh_s, rtol=2e-2, atol=2e-2)


def test_pallas_bwd_kernel_subtiled_large_molecules(key):
    """VERDICT r2 #6: the handwritten backward kernel covers GEOM-scale
    molecules via sub-molecule source tiling.  N=60 (padded to 64 inside the
    fast path; 64^2 = 4096 edge rows > WHOLE_MOL_ROWS) — full parameter
    gradients through Pallas fwd+bwd (interpret) match the packed-XLA path."""
    mc, mod, lcfg, dc, dl = _cfgs(num_layers=1)
    module = GCPNetDynamics(mc, mod, lcfg, dc, dl, remat_interactions=False)
    b, n = 2, 60
    sizes = jnp.array([[55], [60]])
    node_mask = (jnp.arange(n)[None, :] < sizes).astype(jnp.float32)
    xh = jax.random.normal(key, (b, n, 9)) * node_mask[..., None]
    _, x = centralize(xh[..., :3], node_mask)
    xh = jnp.concatenate([x, xh[..., 3:]], -1)
    t = jax.random.uniform(jax.random.PRNGKey(8), (b, 1))
    params = module.init(jax.random.PRNGKey(9), xh, t, node_mask)

    fast_xla = FastGCPNetDynamics(mc, mod, lcfg, dc, dl, use_pallas=False)
    fast_pl = FastGCPNetDynamics(mc, mod, lcfg, dc, dl, use_pallas=True, interpret=True)

    def loss(p, net):
        return jnp.sum(net.apply(p, xh, t, node_mask) ** 2)

    g_xla = jax.grad(lambda p: loss(p, fast_xla))(params)
    g_pl = jax.grad(lambda p: loss(p, fast_pl))(params)
    for (path, gx), gp in zip(jax.tree_util.tree_leaves_with_path(g_xla),
                              jax.tree.leaves(g_pl)):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gx), rtol=2e-3, atol=2e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )
