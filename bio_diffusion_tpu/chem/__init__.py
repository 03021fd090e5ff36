"""Host-side chemistry: bond tables, stability metrics, molecule I/O, RDKit bridge."""

from bio_diffusion_tpu.chem.stability import (
    get_bond_length_arrays,
    get_bond_order,
    get_bond_order_batch,
    check_molecular_stability,
    batch_molecular_stability,
)

__all__ = [
    "get_bond_length_arrays",
    "get_bond_order",
    "get_bond_order_batch",
    "check_molecular_stability",
    "batch_molecular_stability",
]
