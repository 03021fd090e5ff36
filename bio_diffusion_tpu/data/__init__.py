"""Data pipeline: dense batches, dataset registries, QM9/GEOM loaders."""

from bio_diffusion_tpu.data.batch import (
    DenseDataset,
    DenseMolBatch,
    collate_dense,
    iterate_dense_batches,
    select_bucket,
)
from bio_diffusion_tpu.data.dataset_info import get_dataset_info

__all__ = [
    "DenseDataset",
    "DenseMolBatch",
    "collate_dense",
    "iterate_dense_batches",
    "select_bucket",
    "get_dataset_info",
]
