"""Training-step benchmark: module path vs fast (packed/Pallas) path.

Measures steady-state wall time of the full jitted train step (loss -> grad
-> adaptive clip -> AMSGrad -> EMA) on the flagship 9-layer QM9 GCPNet.

Usage:
  python scripts/bench_train_step.py [--batch 64] [--nodes 29] [--layers 9]
      [--precision bf16|f32] [--paths module,xla,pallas] [--steps 20]
      [--remat]   # remat applies to the module path only
      [--curve K] # print the loss every K steps (trajectory comparison
                  # between paths; the per-step host sync perturbs timing)
      [--donate]  # donate the train state into the step (in-place buffers)
      [--geom]    # GEOM config (4 layers, e=16/xi=8, 16 types, no charges)
      [--split]   # roofline split of the pallas path: fwd (loss-only) /
                  # bwd (grad - fwd) / clip+optimizer+EMA (step - grad),
                  # logical FLOPs from the module path's XLA cost analysis
                  # (identical math; Pallas custom calls are uncountable),
                  # and an MFU estimate vs the chip's bf16 peak

Prints one line per path: name, ms/step, steps/s.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)

    from bio_diffusion_tpu.utils.compilation_cache import enable_compilation_cache

    cache_dir = enable_compilation_cache()
    if cache_dir:
        # compile= figures below are cache-DESERIALIZATION time on a warm
        # cache; set JAX_COMPILATION_CACHE_DIR= (empty) for cold numbers
        print(f"# persistent compilation cache: {cache_dir}", file=sys.stderr)

    def opt(flag, default):
        if flag in argv:
            return argv[argv.index(flag) + 1]
        return default

    # --geom defaults to its flagship training shape (B=8, N=181 — the
    # geom_mol_gen_ddpm config); explicit --batch/--nodes still override
    geom = "--geom" in argv
    batch = int(opt("--batch", 8 if geom else 64))
    nodes = int(opt("--nodes", 181 if geom else 29))
    layers = int(opt("--layers", 9))
    precision = opt("--precision", "bf16")
    steps = int(opt("--steps", 20))
    paths = opt("--paths", "module,xla,pallas").split(",")
    remat = "--remat" in argv
    curve = int(opt("--curve", 0))

    import jax
    import jax.numpy as jnp
    import numpy as np

    if precision == "bf16":
        jax.config.update("jax_default_matmul_precision", "bfloat16")

    from bio_diffusion_tpu.config.schema import (
        DataloaderConfig, DiffusionConfig, LayerConfig, ModelConfig, ModuleConfig,
        OptimizerConfig,
    )
    from bio_diffusion_tpu.data.batch import DenseMolBatch
    from bio_diffusion_tpu.models.diffusion import EquivariantVariationalDiffusion
    from bio_diffusion_tpu.models.gcpnet import GCPNetDynamics
    from bio_diffusion_tpu.models.gcpnet_fast import FastGCPNetDynamics
    from bio_diffusion_tpu.ops.geometry import centralize
    from bio_diffusion_tpu.train.state import create_train_state, make_optimizer
    from bio_diffusion_tpu.train.step import make_train_step

    cdt = "bfloat16" if precision == "bf16" else None
    dc = DiffusionConfig(num_timesteps=1000)
    if "--geom" in argv:
        dl = DataloaderConfig(dataset="GEOM", num_atom_types=16, include_charges=False)
        mc = ModelConfig(e_hidden_dim=16, xi_hidden_dim=8,
                         num_encoder_layers=layers if "--layers" in argv else 4)
    else:
        dl = DataloaderConfig()
        mc = ModelConfig(num_encoder_layers=layers)
    mod, lcfg = ModuleConfig(), LayerConfig()

    module_dyn = GCPNetDynamics(mc, mod, lcfg, dc, dl, remat_interactions=remat,
                                compute_dtype=cdt)
    evd = EquivariantVariationalDiffusion(dynamics=module_dyn, diffusion_cfg=dc,
                                          dataloader_cfg=dl)

    # synthetic batch at flagship shapes
    from bio_diffusion_tpu.config.schema import compute_num_atom_types

    k_types = compute_num_atom_types(dl)
    rng = np.random.default_rng(0)
    num_atoms = rng.integers(max(nodes - 10, 3), nodes + 1, size=batch)
    mask = (np.arange(nodes)[None, :] < num_atoms[:, None]).astype(np.float32)
    x = rng.normal(size=(batch, nodes, 3)).astype(np.float32) * mask[..., None]
    types = rng.integers(0, k_types, size=(batch, nodes))
    one_hot = np.eye(k_types, dtype=np.float32)[types] * mask[..., None]
    charges = ((types + 1).astype(np.float32)[..., None] * mask[..., None]
               )[..., : int(dl.include_charges)]
    b = DenseMolBatch(x=jnp.asarray(x), one_hot=jnp.asarray(one_hot),
                      charges=jnp.asarray(charges), node_mask=jnp.asarray(mask),
                      context=None)

    key = jax.random.PRNGKey(0)
    _, x0 = centralize(b.x, b.node_mask)
    params = evd.init(key, x0, b.one_hot, b.charges, b.node_mask, key, training=True)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"# device={jax.devices()[0]} B={batch} N={nodes} L={mc.num_encoder_layers} "
          f"{precision} params={n_params:,} remat(module)={remat}", file=sys.stderr)

    from bio_diffusion_tpu.models.distributions import NumNodesDistribution
    hist = {int(n): int(c) for n, c in zip(*np.unique(num_atoms, return_counts=True))}
    nodes_dist = NumNodesDistribution(hist)
    opt_tx = make_optimizer(OptimizerConfig())

    donate = "--donate" in argv

    def bench(name, evd_variant):
        step = make_train_step(evd_variant, opt_tx, dc, dl, nodes_dist.log_prob_table,
                               donate=donate)
        # donated steps consume their input buffers — hand them copies so
        # `params` stays usable for later paths and the --split section
        state = create_train_state(
            jax.tree.map(jnp.copy, params) if donate else params, opt_tx
        )
        t0 = time.time()
        state, metrics = step(state, b, jax.random.PRNGKey(1))
        loss0 = float(metrics["loss"])  # forces completion
        compile_s = time.time() - t0
        t0 = time.time()
        for i in range(steps):
            state, metrics = step(state, b, jax.random.PRNGKey(2 + i))
            if curve and (i + 1) % curve == 0:
                print(f"#   {name} step {i + 1}: loss={float(metrics['loss']):.4f}",
                      file=sys.stderr)
        loss = float(metrics["loss"])  # forces completion
        dt = (time.time() - t0) / steps
        print(f"{name}: {dt * 1e3:.1f} ms/step ({1.0 / dt:.2f} steps/s) "
              f"compile={compile_s:.1f}s loss={loss:.4f}")
        return dt

    results = {}
    if "module" in paths:
        results["module"] = bench("module ", evd)
    if "xla" in paths:
        fast_xla = FastGCPNetDynamics(mc, mod, lcfg, dc, dl, compute_dtype=cdt,
                                      use_pallas=False)
        results["xla"] = bench("fast-xla", evd.clone(dynamics=fast_xla))
    if "pallas" in paths:
        fast_pl = FastGCPNetDynamics(mc, mod, lcfg, dc, dl, compute_dtype=cdt,
                                     use_pallas=True)
        results["pallas"] = bench("fast-pallas", evd.clone(dynamics=fast_pl))
    if "module" in results:
        for k, v in results.items():
            if k != "module":
                print(f"# speedup {k} vs module: {results['module'] / v:.2f}x")

    if "--split" in argv:
        # ---- roofline split (VERDICT r4 #5): where does the step go? ----
        # fwd = loss-only jit; bwd = value_and_grad - fwd; glue = full step
        # - value_and_grad (adaptive clip + AMSGrad + EMA + state rebuild).
        # Logical FLOPs come from the MODULE path's XLA cost analysis (same
        # math; the pallas custom calls are invisible to cost analysis).
        import optax

        from bio_diffusion_tpu.train.step import make_loss_fn

        fast_pl = FastGCPNetDynamics(mc, mod, lcfg, dc, dl, compute_dtype=cdt,
                                     use_pallas=True)
        evd_pl = evd.clone(dynamics=fast_pl)
        loss_fn = make_loss_fn(evd_pl, dc, dl, nodes_dist.log_prob_table, training=True)

        def fwd_fn(p, bb, k):
            return loss_fn(p, bb, k)[0]

        def grad_fn(p, bb, k):
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, bb, k)
            # return the grad norm so the full backward survives DCE with
            # minimal device->host traffic
            return loss, optax.global_norm(grads)

        fwd_j = jax.jit(fwd_fn)
        grad_j = jax.jit(grad_fn)

        def time_it(fn, *args):
            out = fn(*args)
            float(np.asarray(jax.tree.leaves(out)[0]))  # force completion
            t0 = time.time()
            for _ in range(steps):
                out = fn(*args)
            float(np.asarray(jax.tree.leaves(out)[0]))
            return (time.time() - t0) / steps

        kk = jax.random.PRNGKey(1)
        fwd_s = time_it(fwd_j, params, b, kk)
        grad_s = time_it(grad_j, params, b, kk)
        step_s = results.get("pallas")
        if step_s is None:
            step = make_train_step(evd_pl, opt_tx, dc, dl, nodes_dist.log_prob_table,
                                   donate=False)
            state = create_train_state(params, opt_tx)
            state, m = step(state, b, kk)
            float(m["loss"])
            t0 = time.time()
            for i in range(steps):
                state, m = step(state, b, jax.random.fold_in(kk, i))
            float(m["loss"])
            step_s = (time.time() - t0) / steps

        # logical FLOPs from the module path (cost analysis may be
        # unavailable on remote backends — report n/a then)
        flops_fwd = flops_grad = None
        try:
            loss_mod = make_loss_fn(evd, dc, dl, nodes_dist.log_prob_table, training=True)

            def grad_mod(p, bb, k):
                (loss, _), grads = jax.value_and_grad(loss_mod, has_aux=True)(p, bb, k)
                return loss, optax.global_norm(grads)

            ca_f = jax.jit(lambda p, bb, k: loss_mod(p, bb, k)[0]).lower(
                params, b, kk).compile().cost_analysis()
            ca_g = jax.jit(grad_mod).lower(params, b, kk).compile().cost_analysis()
            if isinstance(ca_f, list):
                ca_f, ca_g = ca_f[0], ca_g[0]
            flops_fwd = float(ca_f.get("flops", 0)) or None
            flops_grad = float(ca_g.get("flops", 0)) or None
        except Exception as e:  # noqa: BLE001 — cost analysis is best-effort
            print(f"# cost_analysis unavailable: {type(e).__name__}: {e}",
                  file=sys.stderr)

        bwd_s = grad_s - fwd_s
        glue_s = step_s - grad_s
        print(f"split: fwd={fwd_s * 1e3:.1f} ms  bwd={bwd_s * 1e3:.1f} ms  "
              f"clip+opt+ema={glue_s * 1e3:.1f} ms  (step={step_s * 1e3:.1f} ms)")
        peak = 197e12  # TPU v5e bf16 peak FLOP/s per chip
        if flops_grad:
            print(f"flops: fwd={flops_fwd:.3e}  fwd+bwd={flops_grad:.3e}  "
                  f"MFU(step)={flops_grad / (step_s * peak) * 100:.2f}%  "
                  f"MFU(fwd+bwd)={flops_grad / (grad_s * peak) * 100:.2f}%  "
                  f"(bf16 peak {peak / 1e12:.0f} TFLOP/s)")


if __name__ == "__main__":
    main()
