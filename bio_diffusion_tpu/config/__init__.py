"""Typed config schema + YAML composition."""

from bio_diffusion_tpu.config.schema import (
    DataloaderConfig,
    DiffusionConfig,
    LayerConfig,
    ModelConfig,
    ModuleConfig,
    MPConfig,
    OptimizerConfig,
    TrainerConfig,
    compute_num_atom_types,
    from_dict,
    to_dict,
)

__all__ = [
    "DataloaderConfig", "DiffusionConfig", "LayerConfig", "ModelConfig",
    "ModuleConfig", "MPConfig", "OptimizerConfig", "TrainerConfig",
    "compute_num_atom_types", "from_dict", "to_dict",
]
