"""Serving subsystem tests: MoleculeServer micro-batching + the HTTP CLI.

The serving layer is an addition over the reference (whose inference entry
points are one-shot scripts); these tests pin its contracts: fixed compiled
shapes, request coalescing, seeded-request determinism, and the HTTP API.
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # resident-server e2e — excluded from `make test-fast`

TINY = [
    "datamodule.dataloader_cfg.dataset=synthetic",
    "model.model_cfg.h_hidden_dim=16",
    "model.model_cfg.chi_hidden_dim=4",
    "model.model_cfg.e_hidden_dim=8",
    "model.model_cfg.xi_hidden_dim=2",
    "model.model_cfg.num_encoder_layers=1",
    "model.diffusion_cfg.num_timesteps=10",
]


@pytest.fixture(scope="module")
def server():
    from bio_diffusion_tpu.cli.common import default_config_dir
    from bio_diffusion_tpu.cli.serve import build_server
    from bio_diffusion_tpu.config.loader import load_config

    cfg = load_config(
        default_config_dir(), "serve",
        TINY + ["serving_batch_size=2", "buckets=[6]", "use_mesh=false",
                "max_wait_ms=300"],
    )
    srv = build_server(cfg)
    yield srv
    srv.close()


def test_generate_basic(server):
    out = server.generate(3, num_nodes=6)
    assert out["num_molecules"] == 3
    for mol in out["molecules"]:
        assert mol["size"] == 6
        assert len(mol["atoms"]) == 6
        assert np.asarray(mol["positions"]).shape == (6, 3)
        assert isinstance(mol["stable"], bool)
    # 3 jobs at batch_size=2 -> 2 device batches
    assert server.stats["batches"] >= 2


def test_concurrent_requests_coalesce(server):
    before = dict(server.stats)
    results = [None, None]

    def call(i):
        results[i] = server.generate(1, num_nodes=6)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r["num_molecules"] == 1 for r in results)
    jobs = server.stats["batched_jobs"] - before["batched_jobs"]
    batches = server.stats["batches"] - before["batches"]
    assert jobs == 2
    # with a 300 ms linger on a warm executable the two 1-molecule requests
    # share one device batch
    assert batches == 1


def test_seeded_request_is_deterministic(server):
    a = server.generate(2, num_nodes=6, seed=5)
    b = server.generate(2, num_nodes=6, seed=5)
    for ma, mb in zip(a["molecules"], b["molecules"]):
        assert ma["atoms"] == mb["atoms"]
        np.testing.assert_allclose(ma["positions"], mb["positions"], atol=1e-6)


def test_sampled_sizes_and_describe(server):
    before = server.describe()["stats"]["molecules"]
    out = server.generate(2)  # sizes drawn from the nodes distribution
    # sizes are capped by the largest compiled bucket (6 here)
    assert all(1 <= m["size"] <= 6 for m in out["molecules"])
    desc = server.describe()
    assert desc["status"] == "ok"
    assert desc["batch_size"] == 2
    assert desc["stats"]["molecules"] == before + 2
    assert desc["stats"]["avg_batch_occupancy"] > 0


def test_request_validation(server):
    with pytest.raises(ValueError, match="num_samples"):
        server.generate(0)
    with pytest.raises(ValueError, match="exceeds the largest"):
        server.generate(1, num_nodes=40)


def test_seeded_without_num_nodes_is_deterministic(server):
    a = server.generate(2, seed=11)
    b = server.generate(2, seed=11)
    assert [m["size"] for m in a["molecules"]] == [m["size"] for m in b["molecules"]]
    for ma, mb in zip(a["molecules"], b["molecules"]):
        assert ma["atoms"] == mb["atoms"]
        np.testing.assert_allclose(ma["positions"], mb["positions"], atol=1e-6)


def test_size_affine_batching():
    """Size-sorted batching: jobs of different size buckets never share a
    batch when pure full batches exist for both (device cost ~N^2.2 in the
    padded bucket), and an under-full batch on linger expiry carries the
    smaller job along (padded slots cost the same as real jobs)."""
    import time

    from bio_diffusion_tpu.cli.common import default_config_dir
    from bio_diffusion_tpu.cli.serve import build_server
    from bio_diffusion_tpu.config.loader import load_config

    cfg = load_config(
        default_config_dir(), "serve",
        TINY + ["serving_batch_size=2", "buckets=[4,6]", "use_mesh=false",
                "max_wait_ms=300"],
    )
    srv = build_server(cfg)
    try:
        # --- separation: 2 size-3 jobs + 2 size-6 jobs, submitted together,
        # run as one bucket-4 batch and one bucket-6 batch (FIFO batching
        # would mix them into bucket-6 batches)
        results = [None, None]

        def call(i, n):
            results[i] = srv.generate(2, num_nodes=n)

        threads = [threading.Thread(target=call, args=(0, 3)),
                   threading.Thread(target=call, args=(1, 6))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(r["num_molecules"] == 2 for r in results)
        bb = srv.describe()["stats"]["bucket_batches"]
        assert bb.get(4) == 1 and bb.get(6) == 1

        # --- top-up: one size-6 job, then one size-3 job 50 ms later; the
        # linger expires on the size-6 group, which runs topped up with the
        # size-3 job -> ONE bucket-6 batch covering both
        before = srv.describe()["stats"]["batches"]

        def call1(i, n):
            results[i] = srv.generate(1, num_nodes=n)

        t6 = threading.Thread(target=call1, args=(0, 6))
        t3 = threading.Thread(target=call1, args=(1, 3))
        t6.start()
        time.sleep(0.05)
        t3.start()
        t6.join()
        t3.join()
        assert results[0]["molecules"][0]["size"] == 6
        assert results[1]["molecules"][0]["size"] == 3
        assert srv.describe()["stats"]["batches"] - before == 1
    finally:
        srv.close()


def test_explicit_trainer_precision_is_honored():
    """An explicit trainer.precision=fp32 override must not be silently
    flipped to the bf16 serving default (ADVICE r4); the top-level
    precision key remains the documented serving knob."""
    from bio_diffusion_tpu.cli.common import default_config_dir
    from bio_diffusion_tpu.cli.serve import serving_precision
    from bio_diffusion_tpu.config.loader import load_config

    base = TINY + ["serving_batch_size=2", "buckets=[6]", "use_mesh=false"]
    cfg = load_config(default_config_dir(), "serve", base)
    assert serving_precision(cfg) == "bf16"  # serving default
    cfg = load_config(default_config_dir(), "serve",
                      base + ["trainer.precision=fp32"])
    assert serving_precision(cfg) == "fp32"  # explicit override wins
    cfg = load_config(default_config_dir(), "serve",
                      base + ["precision=fp32"])
    assert serving_precision(cfg) == "fp32"  # documented opt-out
    cfg = load_config(default_config_dir(), "serve",
                      base + ["precision=fp32", "trainer.precision=bf16"])
    assert serving_precision(cfg) == "bf16"


def test_cross_pool_aging_no_starvation():
    """The max_job_age_s queueing-delay bound holds GLOBALLY: a job at one
    num_timesteps must not starve behind a sustained stream of coherent
    full batches at another num_timesteps.  Once it ages past
    max_job_age_s, its pool runs next (cross-pool aging) even though a
    coherent full pool exists every scheduling round."""
    import time

    from bio_diffusion_tpu.cli.common import default_config_dir
    from bio_diffusion_tpu.cli.serve import build_server
    from bio_diffusion_tpu.config.loader import load_config

    cfg = load_config(
        default_config_dir(), "serve",
        TINY + ["serving_batch_size=2", "buckets=[6]", "use_mesh=false",
                "max_wait_ms=10000", "max_job_age_s=0.3"],
    )
    srv = build_server(cfg)
    try:
        # warm both scan lengths so compile time cannot mask the scheduling
        srv.generate(2, num_nodes=6, num_timesteps=10)
        srv.generate(1, num_nodes=6, num_timesteps=5)

        stop = threading.Event()

        def stream():
            # sustained coherent full batches at T=10: without cross-pool
            # aging, coherent_full_pool() always picks this pool and the
            # T=5 job below waits out the full 10 s linger
            while not stop.is_set():
                srv.generate(2, num_nodes=6, num_timesteps=10)

        st = threading.Thread(target=stream)
        st.start()
        try:
            time.sleep(0.1)  # let the stream establish
            t0 = time.time()
            out = srv.generate(1, num_nodes=6, num_timesteps=5, timeout=8)
            waited = time.time() - t0
        finally:
            stop.set()
            st.join()
        assert out["num_molecules"] == 1
        # served shortly after the 0.3 s age bound — nowhere near the 10 s
        # linger that pre-fix scheduling would impose
        assert waited < 5.0, f"aged cross-pool job waited {waited:.1f}s"
    finally:
        srv.close()


def test_http_server_roundtrip():
    from bio_diffusion_tpu.cli.serve import main

    httpd, server = main(TINY + [
        "serving_batch_size=2", "buckets=[6]", "use_mesh=false",
        "warmup=false", "port=0", "host=127.0.0.1", "--background=thread",
    ])
    try:
        port = httpd.server_address[1]
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["batch_size"] == 2

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"num_samples": 2, "num_nodes": 6, "seed": 1}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            out = json.loads(r.read())
        assert out["num_molecules"] == 2
        assert len(out["molecules"][0]["atoms"]) == 6

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/nope") as r:
            pass
    except urllib.error.HTTPError as e:
        assert e.code == 404
    finally:
        httpd.shutdown()
        server.close()


def test_cli_help_flag(capsys):
    from bio_diffusion_tpu.cli.mol_gen_sample import main as sample_main

    with pytest.raises(SystemExit) as e:
        sample_main(["--help"])
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert "Molecule sampling entry point" in out  # module docstring
    assert "ckpt_path" in out and "num_samples" in out  # composed defaults


def test_serve_with_mesh():
    # data-parallel serving over the 8 virtual CPU devices (conftest)
    from bio_diffusion_tpu.cli.common import default_config_dir
    from bio_diffusion_tpu.cli.serve import build_server
    from bio_diffusion_tpu.config.loader import load_config

    cfg = load_config(
        default_config_dir(), "serve",
        TINY + ["serving_batch_size=8", "buckets=[6]", "use_mesh=true"],
    )
    srv = build_server(cfg)
    try:
        assert srv.sampler.mesh is not None
        out = srv.generate(3, num_nodes=6)
        assert out["num_molecules"] == 3
        assert all(len(m["atoms"]) == 6 for m in out["molecules"])
    finally:
        srv.close()


def test_serve_rejects_conditional_models():
    from bio_diffusion_tpu.cli.common import default_config_dir
    from bio_diffusion_tpu.cli.serve import build_server
    from bio_diffusion_tpu.config.loader import load_config

    cfg = load_config(
        default_config_dir(), "serve",
        TINY + ["model.module_cfg.conditioning=[alpha]"],
    )
    with pytest.raises(ValueError, match="unconditional"):
        build_server(cfg)
