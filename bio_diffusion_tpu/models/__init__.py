"""Model zoo: GCPNet/EGNN denoisers, diffusion core, distributions."""

from bio_diffusion_tpu.models.gcp import GCP, GCP2, make_gcp
from bio_diffusion_tpu.models.gcpnet import GCPNetDynamics
from bio_diffusion_tpu.models.diffusion import (
    EquivariantVariationalDiffusion,
    GammaNetwork,
    PositiveLinear,
    assemble_nll,
)
from bio_diffusion_tpu.models.distributions import (
    CategoricalDistribution,
    NumNodesDistribution,
    PropertiesDistribution,
    compute_mean_mad,
)

__all__ = [
    "GCP", "GCP2", "make_gcp", "GCPNetDynamics",
    "EquivariantVariationalDiffusion", "GammaNetwork", "PositiveLinear",
    "assemble_nll", "CategoricalDistribution", "NumNodesDistribution",
    "PropertiesDistribution", "compute_mean_mad",
]
