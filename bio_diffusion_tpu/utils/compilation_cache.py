"""Persistent XLA compilation cache.

Compiled executables are keyed by HLO + compile options and reused across
processes, so repeated CLI invocations / benches skip XLA compilation
entirely — on remote-compile TPU runtimes (where a cold compile of the
9-layer model takes minutes) this is the difference between a usable and
an unusable iteration loop.  The reference has no analogue (PyTorch eager
has no compile step to cache).
"""

from __future__ import annotations

import os
from typing import Optional


def enable_compilation_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Turn on jax's persistent compilation cache.

    Resolution order: explicit arg, ``JAX_COMPILATION_CACHE_DIR``,
    ``BIO_DIFFUSION_CACHE_DIR``, then ``~/.cache/bio_diffusion_tpu/xla``.
    Set either env var to the empty string to disable.  Returns the cache
    dir, or None when disabled/unsupported (older jax).
    """
    for env in ("JAX_COMPILATION_CACHE_DIR", "BIO_DIFFUSION_CACHE_DIR"):
        if cache_dir is None and env in os.environ:
            cache_dir = os.environ[env]
    if cache_dir is None:
        cache_dir = os.path.expanduser("~/.cache/bio_diffusion_tpu/xla")
    if not cache_dir:
        return None

    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # only persist compiles that are worth the (de)serialization cost
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except (AttributeError, ValueError, OSError):
        return None
    return cache_dir
