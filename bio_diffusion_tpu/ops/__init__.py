"""Core tensor ops: geometry, frames, schedules, masked reductions."""

from bio_diffusion_tpu.ops.scalar_vector import ScalarVector
from bio_diffusion_tpu.ops.geometry import (
    safe_norm,
    safe_normalize,
    centralize,
    decentralize,
    localize,
    scalarize,
    vectorize,
    node_mean_frames,
    orientations,
    edge_features,
    masked_mean,
    masked_sum,
)
from bio_diffusion_tpu.ops.schedules import (
    cosine_beta_schedule,
    clip_noise_schedule,
    polynomial_schedule,
    predefined_gamma_table,
)

__all__ = [
    "ScalarVector",
    "safe_norm",
    "safe_normalize",
    "centralize",
    "decentralize",
    "localize",
    "scalarize",
    "vectorize",
    "node_mean_frames",
    "orientations",
    "edge_features",
    "masked_mean",
    "masked_sum",
    "cosine_beta_schedule",
    "clip_noise_schedule",
    "polynomial_schedule",
    "predefined_gamma_table",
]
