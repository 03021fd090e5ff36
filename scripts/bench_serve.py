"""Serving-path benchmark: sustained throughput + request latency.

Measures the resident server (bio_diffusion_tpu/serve.py) end to end —
micro-batching, device execution, host-side decode — the way a deployment
sees it, as opposed to bench.py's raw device-loop rate.

  python scripts/bench_serve.py            # defaults: QM9 shapes
  SERVE_BATCH=250 SERVE_STEPS=1000 SERVE_NODES=19 SERVE_REQUESTS=8 \
  SERVE_CONCURRENCY=4 python scripts/bench_serve.py

SERVE_NODES=dist draws each molecule's size from the QM9 size distribution
(the realistic production mix) over the server's full bucket ladder — the
workload where size-affine micro-batching matters; SERVE_NODES=<int> pins
every molecule to one size/bucket (the pure device-rate SLO).
SERVE_PRECISION=fp32 restores the exact-parity body (default bf16, the
headline bench precision).

Prints one JSON line:
  {"molecules_per_s": ..., "denoiser_evals_per_s": ..., "latency_s": {...}}
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from bio_diffusion_tpu.cli.common import default_config_dir
    from bio_diffusion_tpu.cli.serve import build_server
    from bio_diffusion_tpu.config.loader import load_config
    from bio_diffusion_tpu.utils.compilation_cache import enable_compilation_cache

    # this script builds the server directly (no parse_cli), so it must
    # enable the persistent compile cache itself — a dist-mix warmup
    # compiles the full bucket ladder and would otherwise start cold on
    # every invocation
    enable_compilation_cache()

    precision = os.environ.get("SERVE_PRECISION", "bf16")
    if precision in ("bf16", "bfloat16"):
        jax.config.update("jax_default_matmul_precision", "bfloat16")

    batch = int(os.environ.get("SERVE_BATCH", 250))
    steps = int(os.environ.get("SERVE_STEPS", 1000))
    nodes_env = os.environ.get("SERVE_NODES", "19")
    nodes = None if nodes_env == "dist" else int(nodes_env)
    n_requests = int(os.environ.get("SERVE_REQUESTS", 8))
    concurrency = int(os.environ.get("SERVE_CONCURRENCY", 4))
    if n_requests < concurrency:
        raise SystemExit(f"SERVE_REQUESTS ({n_requests}) must be >= SERVE_CONCURRENCY ({concurrency})")
    mols_per_request = int(os.environ.get("SERVE_REQ_MOLS", batch))

    cfg = load_config(default_config_dir(), "serve", [
        "datamodule.dataloader_cfg.dataset=synthetic",
        f"serving_batch_size={batch}",
        ("buckets=[%s]" % os.environ["SERVE_BUCKETS"]
         if os.environ.get("SERVE_BUCKETS")
         else "buckets=null" if nodes is None else f"buckets=[{nodes}]"),
        f"num_timesteps={steps}",
        f"precision={precision}",
        "use_mesh=" + os.environ.get("SERVE_MESH", "true"),
    ])
    server = build_server(cfg)
    t0 = time.time()
    server.warmup()
    print(f"# warmup(compile) {time.time() - t0:.1f}s device={jax.devices()[0]}",
          file=sys.stderr)

    latencies = []
    lat_lock = threading.Lock()

    def client(i):
        for r in range(n_requests // concurrency):
            t = time.time()
            # nodes=None: sizes drawn per molecule from the dataset's size
            # distribution (server nodes_dist) — the realistic serving mix
            out = server.generate(mols_per_request, num_nodes=nodes, timeout=3600)
            with lat_lock:
                latencies.append(time.time() - t)
            assert out["num_molecules"] == mols_per_request

    t0 = time.time()
    threads = [threading.Thread(target=client, args=(i,)) for i in range(concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0

    total_mols = (n_requests // concurrency) * concurrency * mols_per_request
    lat = sorted(latencies)
    result = {
        "metric": "serving_molecules_per_s",
        "value": round(total_mols / wall, 3),
        "denoiser_evals_per_s": round(total_mols * steps / wall, 1),
        "latency_s": {
            "p50": round(lat[len(lat) // 2], 3),
            "p95": round(lat[min(len(lat) - 1, int(0.95 * len(lat)))], 3),
            "max": round(lat[-1], 3),
        },
        "unit": f"molecules/s ({total_mols} mols x {steps} steps, "
                f"{'dist-sampled sizes' if nodes is None else f'{nodes} atoms'}, "
                f"{concurrency} concurrent clients, batch {batch})",
        # chip-rate comparison: reference single-GPU sampling == 833 denoiser
        # evals/s == 0.833 mols/s at 1000 steps (README.md:133-136); the
        # serving number additionally carries batching + HTTP-path overhead
        "vs_baseline": round(total_mols * steps / wall / 833.0, 3),
        "stats": server.describe()["stats"],
    }
    print(json.dumps(result))
    server.close()


if __name__ == "__main__":
    main()
