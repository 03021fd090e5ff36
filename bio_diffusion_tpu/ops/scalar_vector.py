"""ScalarVector: the (invariant, equivariant) feature pair used throughout GCPNet.

Behavioral counterpart of the reference's ``ScalarVector`` tuple type
(reference: src/models/components/__init__.py:658-735), reworked as a JAX
pytree over dense tensors:

  * ``scalar``: ``[..., S]`` rotation-invariant channels
  * ``vector``: ``[..., V, 3]`` rotation-equivariant 3-vector channels

Leading dims are arbitrary (``[B, N]`` for nodes, ``[B, N, N]`` for edges).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp


class ScalarVector(NamedTuple):
    """A pair of invariant scalar channels and equivariant vector channels.

    NamedTuples are automatically registered JAX pytrees, so ScalarVector
    values flow through jit/grad/scan unchanged.
    """

    scalar: jnp.ndarray  # [..., S]
    vector: jnp.ndarray  # [..., V, 3]

    def __add__(self, other: "ScalarVector") -> "ScalarVector":  # type: ignore[override]
        return ScalarVector(self.scalar + other.scalar, self.vector + other.vector)

    def concat(self, *others: "ScalarVector") -> "ScalarVector":
        """Concatenate channel dims with other ScalarVectors (scalar last dim, vector dim -2)."""
        scalars = [self.scalar] + [o.scalar for o in others]
        vectors = [self.vector] + [o.vector for o in others]
        return ScalarVector(
            jnp.concatenate(scalars, axis=-1),
            jnp.concatenate(vectors, axis=-2),
        )

    def flatten(self) -> jnp.ndarray:
        """Merge into a single ``[..., S + 3V]`` tensor (scalar first, row-major vector)."""
        v = self.vector
        flat_v = v.reshape(v.shape[:-2] + (v.shape[-2] * 3,))
        return jnp.concatenate([self.scalar, flat_v], axis=-1)

    @staticmethod
    def recover(x: jnp.ndarray, vector_dim: int) -> "ScalarVector":
        """Inverse of :meth:`flatten` given the vector channel count."""
        if vector_dim == 0:
            return ScalarVector(x, jnp.zeros(x.shape[:-1] + (0, 3), dtype=x.dtype))
        v = x[..., -3 * vector_dim:].reshape(x.shape[:-1] + (vector_dim, 3))
        s = x[..., : x.shape[-1] - 3 * vector_dim]
        return ScalarVector(s, v)

    def mask(self, node_mask: jnp.ndarray) -> "ScalarVector":
        """Zero out entities where ``node_mask`` (shape = leading dims) is 0."""
        m = node_mask.astype(self.scalar.dtype)
        return ScalarVector(self.scalar * m[..., None], self.vector * m[..., None, None])

    def astype(self, dtype) -> "ScalarVector":
        return ScalarVector(self.scalar.astype(dtype), self.vector.astype(dtype))

    @property
    def scalar_dim(self) -> int:
        return self.scalar.shape[-1]

    @property
    def vector_dim(self) -> int:
        return self.vector.shape[-2]


def dims(scalar: int, vector: int) -> ScalarVector:
    """A (scalar_dim, vector_dim) spec pair; mirrors the reference's use of
    ScalarVector instances as dimensionality descriptors."""
    return ScalarVector(scalar, vector)  # type: ignore[arg-type]
