"""Shared persistent-compile-cache setup.

The big polar/Newton kernels take minutes to compile on a cold TPU
tunnel; with a disk cache a restarted server (or a bench/parity CLI run)
re-serves hard requests immediately. One public helper so the API layer,
``bench.py`` and the parity harness all configure the same cache (the
reference has the same class of problem in a different coat: XFOIL's 90 s
per-strategy timeout, reference main.py:300).
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

__all__ = ["enable_persistent_compile_cache"]


def enable_persistent_compile_cache() -> None:
    """Cache compiled solver kernels on disk across process restarts.

    Best-effort (ignored on failure); override the location with
    ``AIRFOIL_TPU_JAX_CACHE``.
    """
    try:
        import jax

        cache_dir = os.environ.get(
            "AIRFOIL_TPU_JAX_CACHE",
            os.path.expanduser("~/.cache/airfoil_tpu_jax"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          5.0)
    except Exception as e:           # pragma: no cover
        logger.warning("persistent compile cache unavailable: %s", e)
