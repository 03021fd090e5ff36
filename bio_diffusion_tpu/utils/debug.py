"""Debug-mode runtime invariant checks (compiled out by default).

TPU-native counterpart of the reference's in-forward assertions
(``assert_mean_zero_with_mask`` / ``assert_correctly_masked``,
/root/reference/src/models/components/variational_diffusion.py:442-474 and
the masked-value assertion in ``centralize``, models/components/__init__.py:56-57).

The reference asserts on host tensors every forward, forcing a device sync;
under XLA the idiomatic form is ``checkify``: the checks become value-level
error flags carried through the jitted computation and thrown on the host
after the step completes.  All check functions are gated on a *static*
``enabled`` flag — when False (the default) they are python no-ops and
nothing is compiled.

Callers that enable checks must run the function under
``checkify.checkify`` (see ``train/step.py``) or use :func:`checked_call`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify

MASK_TOL = 1e-4
# relative tolerance on the masked mean (reference assert_mean_zero_with_mask
# uses largest_value * 1e-2 / N as the bound)
MEAN_ZERO_REL_TOL = 1e-2

user_checks = checkify.user_checks


def check_correctly_masked(enabled: bool, value: jax.Array, node_mask: jax.Array,
                           name: str = "tensor") -> None:
    """Padded rows of ``value`` must be exactly zero.

    ``node_mask`` is [..., N]; ``value`` is [..., N, C] or [..., N].
    """
    if not enabled:
        return
    mask = node_mask
    if value.ndim == mask.ndim + 1:
        mask = mask[..., None]
    bad = jnp.max(jnp.abs(value * (1.0 - mask.astype(value.dtype))))
    checkify.check(bad < MASK_TOL, f"{name} is not correctly masked (max |pad| = {{b}})", b=bad)


def check_mean_zero_with_mask(enabled: bool, x: jax.Array, node_mask: jax.Array,
                              name: str = "positions") -> None:
    """Masked mean of ``x`` over the node axis must be ~0 (CoM-free subspace).

    Matches the reference's relative bound: |mean| <= max|x| * 1e-2 / N.
    """
    if not enabled:
        return
    m = node_mask.astype(x.dtype)[..., None]
    n = jnp.maximum(jnp.sum(m, axis=-2, keepdims=True), 1.0)
    mean = jnp.sum(x * m, axis=-2, keepdims=True) / n
    largest = jnp.maximum(jnp.max(jnp.abs(x)), 1e-8)
    bound = largest * MEAN_ZERO_REL_TOL / jnp.max(n)
    err = jnp.max(jnp.abs(mean))
    checkify.check(
        err < bound,
        f"{name} violates zero-CoM invariant (max |masked mean| = {{e}}, bound {{b}})",
        e=err, b=bound,
    )


def check_finite(enabled: bool, value: jax.Array, name: str = "tensor") -> None:
    if not enabled:
        return
    checkify.check(jnp.all(jnp.isfinite(value)), f"{name} contains non-finite values")


def checked_call(fn, *args, **kwargs):
    """Run ``fn`` under checkify and throw any tripped invariant on the host.

    For ad-hoc/debug use; jitted callers keep the error as a value and throw
    it outside the jit (train/step.py pattern).
    """
    err, out = checkify.checkify(fn, errors=user_checks)(*args, **kwargs)
    err.throw()
    return out
