"""Real 2-process jax.distributed training (VERDICT r2 #4).

Launches tests/multihost_worker.py as two coordinated OS processes (gRPC
coordinator on localhost, 2 virtual CPU devices each => a 4-device global
mesh) and as one single process with 4 local devices, then asserts the
per-step training losses are identical: `initialize_multihost` and the
global-batch sharding path are exercised as running code, the analogue of
the reference's ddp_sim test (/root/reference/tests/test_train.py:56-65).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env(devices_per_proc, **extra):
    env = dict(os.environ)
    # neutralize the axon TPU sitecustomize; plain CPU backend
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devices_per_proc}"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["EXPECT_GLOBAL_DEVICES"] = "4"
    env.update({k: str(v) for k, v in extra.items()})
    return env


def _parse(stdout, stderr):
    for line in reversed(stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError(f"no JSON line in worker output:\n{stdout}\n{stderr}")


@pytest.mark.slow
def test_two_process_training_matches_single_process():
    port = _free_port()
    coord = f"127.0.0.1:{port}"

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER],
            env=_worker_env(
                2,
                JAX_COORDINATOR_ADDRESS=coord,
                JAX_NUM_PROCESSES=2,
                JAX_PROCESS_ID=pid,
            ),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed rc={p.returncode}:\n{stderr[-4000:]}"
        outs.append(_parse(stdout, stderr))

    assert all(o["process_count"] == 2 for o in outs)
    # both processes see the same replicated loss
    assert np.allclose(outs[0]["losses"], outs[1]["losses"], rtol=1e-6)

    # single-process control: same global mesh shape (4 devices, 1 process)
    ctrl = subprocess.run(
        [sys.executable, WORKER],
        env=_worker_env(4, JAX_NUM_PROCESSES=1),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, cwd=REPO,
        timeout=900,
    )
    assert ctrl.returncode == 0, ctrl.stderr[-4000:]
    ref = _parse(ctrl.stdout, ctrl.stderr)
    assert ref["process_count"] == 1

    assert np.allclose(outs[0]["losses"], ref["losses"], rtol=1e-5), (
        outs[0]["losses"], ref["losses"]
    )
    assert np.isfinite(outs[0]["grad_norm"])
