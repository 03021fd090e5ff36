"""jax.distributed training worker, launched by tests/test_multihost.py.

Counterpart of the reference's 2-process CPU DDP simulation
(/root/reference/configs/trainer/ddp_sim.yaml, tests/test_train.py:56-65):
each process owns 2 virtual CPU devices, `initialize_multihost()` reads the
K8s env contract (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID — the same variables scripts/k8s/tpu_job_template.yaml
exports), and a real GCPNet EVD trains for a few steps on a ('data',)-sharded
global batch.  Prints one JSON line with the final loss so the parent can
assert multi-process == single-process numerics.
"""

import json
import os
import sys


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    multi = int(os.environ.get("JAX_NUM_PROCESSES", "1")) > 1
    from bio_diffusion_tpu.parallel.mesh import initialize_multihost, make_mesh

    if multi:
        initialize_multihost()

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_global = int(os.environ.get("EXPECT_GLOBAL_DEVICES", "4"))
    assert len(jax.devices()) == n_global, (jax.devices(), n_global)
    mesh = make_mesh(devices=jax.devices())

    from bio_diffusion_tpu.config.schema import (
        DataloaderConfig,
        DiffusionConfig,
        LayerConfig,
        ModelConfig,
        ModuleConfig,
        OptimizerConfig,
    )
    from bio_diffusion_tpu.data.batch import DenseMolBatch
    from bio_diffusion_tpu.models.diffusion import EquivariantVariationalDiffusion
    from bio_diffusion_tpu.models.gcpnet import GCPNetDynamics
    from bio_diffusion_tpu.ops.geometry import centralize
    from bio_diffusion_tpu.train.state import create_train_state, make_optimizer
    from bio_diffusion_tpu.train.step import make_train_step

    dc = DiffusionConfig(num_timesteps=10)
    dl = DataloaderConfig()
    net = GCPNetDynamics(
        ModelConfig(h_hidden_dim=8, chi_hidden_dim=2, e_hidden_dim=4,
                    xi_hidden_dim=1, num_encoder_layers=1),
        ModuleConfig(), LayerConfig(), dc, dl, remat_interactions=False,
    )
    evd = EquivariantVariationalDiffusion(dynamics=net, diffusion_cfg=dc, dataloader_cfg=dl)

    # deterministic global batch, identical on every process
    B, N, K = 8, 6, 5
    rng = np.random.default_rng(0)
    mask = np.ones((B, N), np.float32)
    x = rng.normal(size=(B, N, 3)).astype(np.float32)
    x -= x.mean(axis=1, keepdims=True)
    types = rng.integers(0, K, (B, N))
    oh = np.eye(K, dtype=np.float32)[types]
    ch = rng.integers(1, 9, (B, N, 1)).astype(np.float32)

    key = jax.random.PRNGKey(0)
    params = evd.init(
        key, jnp.asarray(x), jnp.asarray(oh), jnp.asarray(ch),
        jnp.asarray(mask), key, training=True,
    )
    # globalize: params replicated, batch sharded over 'data'
    params = multihost_utils.host_local_array_to_global_array(
        jax.tree.map(np.asarray, params), mesh, P()
    )

    per = B // jax.process_count()
    lo = jax.process_index() * per
    local = slice(lo, lo + per)

    def shard(a):
        return multihost_utils.host_local_array_to_global_array(a[local], mesh, P("data"))

    batch = DenseMolBatch(
        x=shard(x), one_hot=shard(oh), charges=shard(ch), node_mask=shard(mask),
    )

    optimizer = make_optimizer(OptimizerConfig(lr=1e-3))
    state = create_train_state(params, optimizer)
    state = jax.tree.map(
        lambda a: multihost_utils.host_local_array_to_global_array(np.asarray(a), mesh, P())
        if hasattr(a, "shape") else a,
        state,
    )
    table = np.zeros(N + 1, np.float32)
    train_step = make_train_step(
        evd, optimizer, dc, dl, table, donate=False,
    )

    losses = []
    for step in range(3):
        state, metrics = train_step(state, batch, jax.random.PRNGKey(42))
        losses.append(float(np.asarray(metrics["loss"])))

    print(json.dumps({
        "process_count": jax.process_count(),
        "losses": losses,
        "grad_norm": float(np.asarray(metrics["grad_norm"])),
    }))


if __name__ == "__main__":
    main()
