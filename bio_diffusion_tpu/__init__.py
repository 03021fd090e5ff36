"""bio_diffusion_tpu: a TPU-native JAX framework for geometry-complete molecular diffusion.

A from-scratch, TPU-first rebuild of the capabilities of
BioinfoMachineLearning/bio-diffusion (GCDM: E(3)-equivariant variational
diffusion over 3D molecules with a GCPNet denoiser).

Design notes (vs. the PyTorch/PyG reference):
  * Molecule batches are dense, statically shaped ``[B, N]`` node tensors and
    ``[B, N, N]`` edge masks (size-bucketed padding) instead of variable-size
    PyG concatenation + torch_scatter.  XLA sees only static shapes.
  * All graph "scatter" reductions become masked sums/means over the edge
    axis; node-wise frame scalarization uses the identity
    ``mean_j(F_ij @ v_i) == (mean_j F_ij) @ v_i`` so the per-node path costs
    O(N) instead of O(N^2).
  * The reverse-diffusion sampler is a single jitted ``lax.scan``.
  * Data parallelism is a ``jax.sharding.Mesh`` + ``shard_map`` train step
    with psum gradient reduction (replacing Lightning DDP / NCCL).
"""

__version__ = "0.1.0"
