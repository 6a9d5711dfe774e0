"""Shared persistent-compile-cache setup.

The big polar/Newton kernels take minutes to compile on a cold TPU
tunnel; with a disk cache a restarted server (or a bench/parity CLI run)
re-serves hard requests immediately. One public helper so the API layer,
``bench.py`` and the parity harness all configure the same cache (the
reference has the same class of problem in a different coat: XFOIL's 90 s
per-strategy timeout, reference main.py:300).

CPU-targeted runs (the test suite, the multichip dryrun) must use a
PER-HOST cache directory: XLA:CPU serialises AOT code specialised to the
build host's CPU features, and a cache carried to a machine with a
different feature set loads with a warning and then executes WRONGLY
(observed: a feature-mismatched ``+prefer-no-scatter`` artifact made a
vmapped polar return non-monotone CL on the linear range — silent wrong
numbers, not a crash). TPU executables run on the device and are immune,
so the shared directory stays host-independent for them.
"""

from __future__ import annotations

import hashlib
import logging
import os
import platform

logger = logging.getLogger(__name__)

__all__ = ["enable_persistent_compile_cache", "host_fingerprint"]


def host_fingerprint() -> str:
    """Short stable id of this host's CPU feature set (for cache keying)."""
    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        feats = platform.machine() + platform.processor()
    return hashlib.sha256(feats.encode()).hexdigest()[:12]


def enable_persistent_compile_cache(per_host: bool = False) -> None:
    """Cache compiled solver kernels on disk across process restarts.

    Best-effort (ignored on failure); override the location with
    ``AIRFOIL_TPU_JAX_CACHE``. Pass ``per_host=True`` from any entry point
    that compiles for XLA:CPU (tests, CPU dryruns) — the cache directory
    gains a host-feature suffix so another machine's AOT artifacts can
    never be loaded here (see module docstring).
    """
    try:
        import jax

        cache_dir = os.environ.get(
            "AIRFOIL_TPU_JAX_CACHE",
            os.path.expanduser("~/.cache/airfoil_tpu_jax"))
        if per_host:
            cache_dir = f"{cache_dir}-{host_fingerprint()}"
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          5.0)
    except Exception as e:           # pragma: no cover
        logger.warning("persistent compile cache unavailable: %s", e)
