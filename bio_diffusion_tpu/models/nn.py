"""Small NN building blocks: torch-parity Linear, nonlinearities, GCP norm/dropout.

The Linear layer reproduces torch.nn.Linear's default initialization
(kaiming-uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both
kernel and bias) so that training dynamics match the reference and imported
checkpoints drop in with a simple transpose.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from bio_diffusion_tpu.ops.scalar_vector import ScalarVector


def _uniform_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class Linear(nn.Module):
    """Dense layer with torch-default init; kernel stored as [in, out]."""

    features: int
    use_bias: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        bound = 1.0 / math.sqrt(in_features) if in_features > 0 else 0.0
        kernel = self.param("kernel", _uniform_init(bound), (in_features, self.features), self.param_dtype)
        y = jnp.einsum("...i,io->...o", x, kernel.astype(x.dtype))
        if self.use_bias:
            bias = self.param("bias", _uniform_init(bound), (self.features,), self.param_dtype)
            y = y + bias.astype(y.dtype)
        return y


def get_nonlinearity(name: Optional[str], slope: float = 1e-2) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """String -> activation fn (reference src/models/__init__.py:30-45)."""
    if name is None:
        return lambda x: x
    name = name.lower().strip()
    if name == "relu":
        return jax.nn.relu
    if name == "leakyrelu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=slope)
    if name == "selu":
        return jax.nn.selu
    if name == "silu":
        return jax.nn.silu
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name in ("identity", "none"):
        return lambda x: x
    raise NotImplementedError(f"Nonlinearity {name} is not implemented.")


def is_identity(name: Optional[str]) -> bool:
    return name is None or name.lower().strip() in ("identity", "none")


def norm_vector(v: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """RMS-style vector-channel norm (reference GCPLayerNorm.norm_vector,
    src/models/components/__init__.py:791-798): divide all channels by the
    sqrt of the mean (over channels) clamped squared channel norms."""
    sq = jnp.clip(jnp.sum(v * v, axis=-1, keepdims=True), min=eps)
    denom = jnp.sqrt(jnp.mean(sq, axis=-2, keepdims=True))
    return v / denom


class GCPLayerNorm(nn.Module):
    """Scalar LayerNorm + vector RMS norm over a ScalarVector.

    Reference: GCPLayerNorm (src/models/components/__init__.py:779-808).
    With ``use_gcp_norm=False`` this is the identity (QM9/GEOM default via
    layer_cfg.use_gcp_norm=false) but still parameter-free in that case.
    """

    use_gcp_norm: bool = True
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        if not self.use_gcp_norm:
            return x
        if isinstance(x, ScalarVector):
            s = nn.LayerNorm(epsilon=1e-5, name="scalar_norm")(x.scalar)
            if x.vector.shape[-2] == 0:
                return ScalarVector(s, x.vector)
            return ScalarVector(s, norm_vector(x.vector, eps=self.eps))
        return nn.LayerNorm(epsilon=1e-5, name="scalar_norm")(x)


class GCPDropout(nn.Module):
    """Scalar dropout + whole-vector-channel dropout (reference :738-776)."""

    rate: float
    use_gcp_dropout: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if not self.use_gcp_dropout or self.rate == 0.0:
            return x
        if isinstance(x, ScalarVector):
            s = nn.Dropout(self.rate, deterministic=deterministic)(x.scalar)
            if deterministic:
                return ScalarVector(s, x.vector)
            # vector dropout: drop entire 3-vector channels
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - self.rate, x.vector.shape[:-1])
            v = x.vector * keep[..., None].astype(x.vector.dtype) / (1.0 - self.rate)
            return ScalarVector(s, v)
        return nn.Dropout(self.rate, deterministic=deterministic)(x)
