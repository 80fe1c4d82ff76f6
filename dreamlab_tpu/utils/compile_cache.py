"""Persistent XLA compile cache.

The compiled executable is this framework's analogue of the reference's
``.rknn`` compiled-graph artifact (SURVEY.md §2.3): first compilation of the
512² 4-step program costs minutes, the cache turns every later process
start / mode switch into a disk load, keeping the reference's 10-20 s
mode-switch budget (README.md:394-397) honest on TPU.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_enabled = False


def enable_compile_cache(path: str | None = None) -> str:
    """Idempotently enable the JAX persistent compilation cache."""
    global _enabled
    import jax

    cache_dir = path or os.environ.get(
        "DREAMLAB_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "dreamlab_tpu", "xla"),
    )
    if _enabled:
        return cache_dir
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    logger.info("XLA compile cache at %s", cache_dir)
    return cache_dir
