"""Device-mesh parallelism: mesh construction and sharding rules."""

from bio_diffusion_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    param_sharding_rules,
    shard_pytree,
)

__all__ = ["make_mesh", "batch_sharding", "param_sharding_rules", "shard_pytree"]
