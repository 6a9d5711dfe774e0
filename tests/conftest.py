"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths
(data-parallel polars, spatially-decomposed LBM) are exercised without TPU
hardware. Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment may install a sitecustomize that registers a TPU backend
# and force-overrides jax_platforms at interpreter start (before this file
# runs); re-assert CPU through the config API, which wins as long as no
# backend has been initialised yet.
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the coupled-solver graphs take minutes to
# build; repeat suite runs hit the cache instead.
_CACHE_DIR = os.environ.get(
    "AIRFOIL_TPU_JAX_CACHE", os.path.expanduser("~/.cache/airfoil_tpu_jax"))
try:
    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass

import numpy as np
import pytest


@pytest.fixture
def naca0012():
    from airfoil_tpu.models import naca4

    return naca4(0, 0, 12, 60)


@pytest.fixture
def naca2412():
    from airfoil_tpu.models import naca4

    return naca4(2, 4, 12, 60)


def write_dat(tmp_path, lines, name="test.dat"):
    p = tmp_path / name
    p.write_text("\n".join(lines))
    return str(p)
