"""Serving entry point: a resident HTTP molecule-generation server.

Production counterpart of the one-shot reference inference scripts
(src/mol_gen_sample.py etc.): loads one checkpoint, pre-compiles the
serving shapes, and serves requests with warm executables and request
micro-batching (see ``bio_diffusion_tpu/serve.py``).

Usage:
  python -m bio_diffusion_tpu.cli.serve ckpt_path=<ckpt> [port=8080] \
      [serving_batch_size=8] [num_timesteps=1000] [warmup_buckets=[20,29]] \
      [use_mesh=true] [k=v ...]

Endpoints:
  GET  /healthz   -> server + device status, warm buckets, stats
  GET  /stats     -> same payload (monitoring alias)
  POST /generate  -> JSON {"num_samples": N, "num_nodes"?: n,
                           "num_timesteps"?: T, "seed"?: s}
                  -> {"molecules": [{"atoms", "positions", "size",
                      "stable", "charges"?}], "mol_stable_frac", "elapsed_s"}
"""

from __future__ import annotations

import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from bio_diffusion_tpu.cli.common import inference_mesh, load_model, nodes_distribution_for, parse_cli
from bio_diffusion_tpu.config.build import build_experiment, get_dataset_info_for
from bio_diffusion_tpu.serve import MoleculeServer
from bio_diffusion_tpu.utils.logging import get_logger

log = get_logger(__name__)


def serving_precision(cfg) -> str:
    """The effective serving precision: an EXPLICIT ``trainer.precision``
    override wins (serve.yaml composes no trainer group, so its presence
    means the user set it); otherwise the top-level ``precision`` key —
    the documented serving knob, default bf16 (the headline bench
    precision; ``precision=fp32`` restores the exact-parity body)."""
    trainer = cfg.get("trainer")
    explicit = trainer.get("precision") if isinstance(trainer, dict) else None
    top = str(cfg.get("precision", "bf16")).lower()
    if explicit is not None:
        eff = "bf16" if str(explicit).lower() in ("bf16", "bfloat16") else "fp32"
        top_n = "bf16" if top in ("bf16", "bfloat16") else "fp32"
        if eff != top_n:
            log.warning(
                f"honoring explicit trainer.precision={explicit} over the "
                f"serving default precision={cfg.get('precision', 'bf16')}"
            )
        return eff
    return "bf16" if top in ("bf16", "bfloat16") else "fp32"


def build_server(cfg) -> MoleculeServer:
    # Serving defaults to the bf16 fast path (the right default for
    # training/parity CLIs is fp32, but it leaves ~25% serving throughput
    # on the table).  An explicit trainer.precision override is honored —
    # never silently flipped (ADVICE r4).
    if serving_precision(cfg) == "bf16":
        cfg = dict(cfg)
        cfg["trainer"] = {**cfg.get("trainer", {}), "precision": "bf16"}
    exp = build_experiment(cfg)
    if exp.module_cfg.conditioning:
        raise ValueError(
            "cli.serve serves unconditional models; property-conditional "
            "generation goes through cli.mol_gen_eval_conditional_qm9"
        )
    evd, params = load_model(exp, cfg.get("ckpt_path"))
    num_timesteps = cfg.get("num_timesteps")
    return MoleculeServer(
        evd, params,
        get_dataset_info_for(exp),
        nodes_distribution_for(exp),
        batch_size=int(cfg.get("serving_batch_size", 8)),
        buckets=cfg.get("buckets"),
        num_timesteps=int(num_timesteps) if num_timesteps else None,
        max_wait_ms=float(cfg.get("max_wait_ms", 5.0)),
        max_job_age_s=float(cfg.get("max_job_age_s", 30.0)),
        mesh=inference_mesh(cfg),
        seed=int(cfg.get("seed", 0)),
        max_request_mols=int(cfg.get("max_request_mols", 10_000)),
    )


def make_handler(server: MoleculeServer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route to our logger
            log.debug("http: " + fmt % args)

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/healthz", "/stats", "/"):
                self._send(200, server.describe())
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                out = server.generate(
                    int(req.get("num_samples", 1)),
                    num_nodes=req.get("num_nodes"),
                    num_timesteps=req.get("num_timesteps"),
                    seed=req.get("seed"),
                    timeout=float(req.get("timeout_s", 600.0)),
                )
                self._send(200, out)
            except (ValueError, TypeError, KeyError, json.JSONDecodeError) as e:
                self._send(400, {"error": f"{type(e).__name__}: {e}"})
            except TimeoutError as e:
                self._send(503, {"error": f"TimeoutError: {e}"})
            except Exception as e:  # noqa: BLE001 — server-side fault
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def main(argv=None):
    cfg, flags = parse_cli(list(sys.argv[1:] if argv is None else argv), "serve")
    if serving_precision(cfg) == "bf16":
        # process-level (entry point only — build_server leaves globals
        # alone so library/test processes are unaffected)
        import jax

        jax.config.update("jax_default_matmul_precision", "bfloat16")
    server = build_server(cfg)
    if bool(cfg.get("warmup", True)):
        server.warmup(cfg.get("warmup_buckets"))

    host = str(cfg.get("host", "0.0.0.0"))
    port = int(cfg.get("port", 8080))
    httpd = ThreadingHTTPServer((host, port), make_handler(server))
    log.info(f"Serving on {host}:{httpd.server_address[1]} "
             f"(batch={server.batch_size}, buckets={server.buckets})")
    if flags.get("background") == "thread":  # used by tests
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        return httpd, server
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        server.close()


if __name__ == "__main__":
    main()
