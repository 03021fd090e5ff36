"""Shape sweep: per-molecule sampling device cost across (batch, N).

Substantiates the eval-protocol tuning constants in
``train/sampling.py::sample_molecules`` and ``bench.py`` (qm9_eval knobs):
how does the steady-state denoiser-eval rate depend on the batch size and
the padded molecule size?  Two results drive the defaults:

  * per-molecule device cost is ~batch-insensitive above ~100 molecules
    (the chip is saturated), so the eval protocol can run SMALLER batches
    to get FINER size buckets at no per-mol cost;
  * cost scales superquadratically in N (fully-connected edges =>
    O(N^2) rows through the kernel), so exact-size buckets beat
    multiple-of-4 padding by more than the extra compiles cost.

Usage:  python scripts/bench_shape_sweep.py [--steps 100]
Prints one JSON line: {"rows": [{batch, nodes, evals_per_s, us_per_mol_step}...],
"n_exponent": fitted d(log cost)/d(log N) at batch 250}.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batches", type=int, nargs="*", default=[32, 64, 125, 250, 500])
    ap.add_argument("--nodes", type=int, nargs="*", default=[16, 19, 22, 25, 29])
    ap.add_argument("--cross", action="store_true",
                    help="sweep batches at nodes[1] and nodes at batches[2] "
                         "(a cross, not the full grid) — 9 compiles, not 25")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bio_diffusion_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    jax.config.update("jax_default_matmul_precision", "bfloat16")

    from bio_diffusion_tpu.config.schema import (
        DataloaderConfig, DiffusionConfig, LayerConfig, ModelConfig, ModuleConfig,
    )
    from bio_diffusion_tpu.models.diffusion import EquivariantVariationalDiffusion
    from bio_diffusion_tpu.models.gcpnet import GCPNetDynamics
    from bio_diffusion_tpu.ops.geometry import centralize
    from bio_diffusion_tpu.train.sampling import SegmentedSampler

    dc = DiffusionConfig(num_timesteps=1000)
    dl = DataloaderConfig()
    net = GCPNetDynamics(ModelConfig(), ModuleConfig(), LayerConfig(), dc, dl,
                         remat_interactions=False, compute_dtype="bfloat16")
    evd = EquivariantVariationalDiffusion(dynamics=net, diffusion_cfg=dc,
                                          dataloader_cfg=dl)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2, 29, 3))
    _, x0 = centralize(x0, jnp.ones((2, 29)))
    oh0 = jax.nn.one_hot(jnp.zeros((2, 29), jnp.int32), 5)
    params = evd.init(key, x0, oh0, jnp.ones((2, 29, 1)), jnp.ones((2, 29)), key,
                      training=False)
    sampler = SegmentedSampler(evd, params, segment_size=args.steps)

    if args.cross:
        n_pin = args.nodes[min(1, len(args.nodes) - 1)]
        b_pin = args.batches[min(2, len(args.batches) - 1)]
        grid = [(b, n_pin) for b in args.batches]
        grid += [(b_pin, n) for n in args.nodes if n != n_pin]
    else:
        grid = [(b, n) for n in args.nodes for b in args.batches]

    rows = []
    for batch, nodes in grid:
        mask = jnp.ones((batch, nodes), dtype=jnp.float32)
        # warmup (compile or cache hit)
        sampler.run(jax.random.PRNGKey(1), mask, num_timesteps=args.steps)
        t0 = time.time()
        sampler.run(jax.random.PRNGKey(2), mask, num_timesteps=args.steps)
        dt = time.time() - t0
        rate = batch * args.steps / dt
        rows.append({
            "batch": batch, "nodes": nodes,
            "evals_per_s": round(rate, 1),
            "us_per_mol_step": round(1e6 * dt / (batch * args.steps), 3),
        })
        print(f"# B={batch:4d} N={nodes:3d}  {rate:10.1f} evals/s  "
              f"{rows[-1]['us_per_mol_step']:7.3f} us/mol-step", file=sys.stderr)

    # fit cost ~ N^k at the largest saturating batch with N coverage
    covered = {b for b in (r["batch"] for r in rows)
               if len({r["nodes"] for r in rows if r["batch"] == b}) > 1}
    fit_b = max((b for b in covered if b >= 125), default=max(covered, default=None))
    pts = [(r["nodes"], r["us_per_mol_step"]) for r in rows if r["batch"] == fit_b]
    k = float(np.polyfit(np.log([p[0] for p in pts]),
                         np.log([p[1] for p in pts]), 1)[0]) if len(pts) > 1 else None
    print(json.dumps({"rows": rows,
                      "n_exponent": round(k, 2) if k is not None else None,
                      "fit_batch": fit_b, "steps": args.steps}))


if __name__ == "__main__":
    main()
