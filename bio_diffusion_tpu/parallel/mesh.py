"""Mesh + sharding layer: the TPU-native replacement for Lightning DDP/NCCL.

The reference's only distribution strategy is data parallelism with NCCL
all-reduce (SURVEY.md §2.2).  Here:

  * ``data`` mesh axis: batch sharding; gradient reduction happens via XLA's
    automatic collectives (psum over ICI) when the loss averages over the
    globally-sharded batch under jit.
  * ``model`` mesh axis: optional FSDP-style parameter sharding — parameter
    leaves whose largest dim divides the axis size are sharded there; the
    rest replicate.  For GCDM's ~10M-param denoiser this is about memory
    headroom at large batch, not necessity.

Everything uses ``jax.sharding`` NamedSharding under ``jax.jit`` — no
hand-written collectives; XLA inserts psum/all-gather/reduce-scatter.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None,
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Process-level init for multi-host (DCN) training.

    TPU-native counterpart of Lightning's multi-node DDP launch
    (reference configs/trainer/ddp.yaml: num_nodes).  On TPU pods the
    arguments are auto-detected from the environment; on other platforms
    pass them explicitly (or via JAX_COORDINATOR_ADDRESS etc.).  Call
    BEFORE any other jax API so jax.devices() returns the global view.
    """
    import os

    # explicit env contract used by the K8s job template
    # (scripts/k8s/tpu_job_template.yaml): indexed Job pods export these
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def default_mesh(num_model_shards: int = 1) -> Optional[Mesh]:
    """('data', 'model') mesh over all (global) devices; None when there is
    a single device (plain jit is sharding-free and marginally cheaper)."""
    devices = jax.devices()
    if len(devices) <= 1:
        return None
    return make_mesh(model=num_model_shards, devices=devices)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest."""
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Optional[Mesh], batch):
    """Place a batch pytree on the mesh: leading dim over 'data' when
    divisible, else fully replicated (ragged drop_last=False final batches
    — still correct, just not batch-parallel).  No-op without a mesh.
    Shared by the Trainer and the eval CLI so the divisibility/ragged
    conventions cannot diverge."""
    if mesh is None:
        return batch
    leading = jax.tree.leaves(batch)[0].shape[0]
    bs = batch_sharding(mesh) if leading % mesh.shape["data"] == 0 else NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, bs) if x is not None else None, batch)


def param_sharding_rules(params, mesh: Mesh) -> object:
    """FSDP-style parameter shardings: shard the largest dim of each leaf
    over the 'model' axis when divisible, else replicate."""
    model_size = mesh.shape["model"]

    def rule(leaf):
        if model_size == 1 or not hasattr(leaf, "shape") or leaf.ndim == 0:
            return NamedSharding(mesh, P())
        dims = list(leaf.shape)
        # shard the largest divisible dim
        order = sorted(range(len(dims)), key=lambda i: -dims[i])
        for i in order:
            if dims[i] % model_size == 0 and dims[i] >= model_size:
                spec = [None] * len(dims)
                spec[i] = "model"
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def shard_pytree(tree, shardings):
    """Device-put a pytree with per-leaf shardings."""
    return jax.tree.map(lambda x, s: jax.device_put(x, s), tree, shardings)
