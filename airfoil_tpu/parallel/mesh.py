"""Multi-chip sharding for polar sweeps.

The reference has no distributed dimension at all (SURVEY.md section 2:
its only concurrency is a 3-slot subprocess semaphore). The TPU-native
scaling axis is the (alpha, Re, airfoil) polar tensor: points are
embarrassingly parallel, so they shard data-parallel over a 1-D
``jax.sharding.Mesh`` and XLA keeps each point's whole solve on its chip —
no collectives on the hot path, ICI only touches the final gather.

The LBM grid has a second, spatial axis (see ``airfoil_tpu.lbm``) for
domain decomposition with halo exchange.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from airfoil_tpu.polar.sweep import _polar_kernel

__all__ = ["batch_mesh", "shard_polar_inputs", "sharded_polar"]


def batch_mesh(devices=None) -> Mesh:
    """A 1-D data-parallel mesh over all (or the given) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, ("batch",))


def shard_polar_inputs(mesh: Mesh, alphas, reynolds):
    """Pad the point list to a device multiple and place it on the mesh."""
    alphas = jnp.atleast_1d(jnp.asarray(alphas, jnp.float32))
    reynolds = jnp.broadcast_to(
        jnp.asarray(reynolds, jnp.float32), alphas.shape)
    n_dev = mesh.devices.size
    pad = (-alphas.shape[0]) % n_dev
    if pad:
        alphas = jnp.concatenate([alphas, jnp.repeat(alphas[-1:], pad)])
        reynolds = jnp.concatenate([reynolds, jnp.repeat(reynolds[-1:], pad)])
    sharding = NamedSharding(mesh, P("batch"))
    return (jax.device_put(alphas, sharding),
            jax.device_put(reynolds, sharding),
            pad)


def sharded_polar(mesh: Mesh, coords, alphas, reynolds, n_panels: int = 160):
    """Run a polar with points sharded data-parallel across the mesh.

    Returns the same tuple as the single-chip polar kernel, with any
    padding stripped.
    """
    coords = jnp.asarray(np.asarray(coords, np.float32))
    a_sh, re_sh, pad = shard_polar_inputs(mesh, alphas, reynolds)
    replicated = NamedSharding(mesh, P())
    coords = jax.device_put(coords, replicated)

    fn = jax.jit(
        lambda c, a, r: _polar_kernel.__wrapped__(c, a, r, n_panels),
        in_shardings=(replicated, NamedSharding(mesh, P("batch")),
                      NamedSharding(mesh, P("batch"))),
    )
    out = fn(coords, a_sh, re_sh)
    if pad:
        out = tuple(o[:-pad] for o in out)
    return out
