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
# build; repeat suite runs hit the cache instead. PER-HOST directory —
# XLA:CPU AOT artifacts from another machine load with a feature-mismatch
# warning and then execute wrongly (silent bad numbers, not a crash).
from airfoil_tpu.utils.compile_cache import enable_persistent_compile_cache

enable_persistent_compile_cache(per_host=True)

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
