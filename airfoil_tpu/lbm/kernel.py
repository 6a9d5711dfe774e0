"""Pallas TPU kernel: K fused LBM steps with the lattice resident in VMEM.

The reference runs 4 steps per frame as 4 WebGL draw calls over ping-pong
RGBA32F textures (reference html:76-80,908 — ~12 MLUPS). The XLA path
already beats that by orders of magnitude, but each fori_loop iteration
round-trips the distribution stack through HBM. This kernel keeps the whole
(9, NY, NX) stack (~2.7 MB at the default 384x192 grid) in VMEM across all
``steps`` substeps — HBM traffic is one load + one store per *batch* of
steps instead of per step, which is where the remaining bandwidth headroom
lives.

Same arithmetic as ``core.step_body`` (injected roll primitive), asserted
equal to the XLA path in tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from airfoil_tpu.lbm.core import step_body

__all__ = ["lbm_steps_pallas"]


def _pltpu_roll2(a, dy, dx):
    # pltpu.roll requires non-negative shifts; -1 == size-1 circularly.
    if dy:
        a = pltpu.roll(a, dy % a.shape[0], axis=0)
    if dx:
        a = pltpu.roll(a, dx % a.shape[1], axis=1)
    return a


def _kernel(scal_ref, f_ref, solid_ref, out_ref, *, steps):
    u0 = scal_ref[0]
    tau = scal_ref[1]
    solid = solid_ref[:]

    def body(_, f):
        return step_body(f, solid, u0, tau, roll2=_pltpu_roll2)

    out_ref[:] = jax.lax.fori_loop(0, steps, body, f_ref[:])


@partial(jax.jit, static_argnames=("steps",))
def lbm_steps_pallas(f, solid, u0, tau, steps: int = 4):
    """Advance ``steps`` LBM steps in one VMEM-resident Pallas kernel.

    Requires NX % 128 == 0 and NY % 8 == 0 (float32 lane/sublane tiles);
    use the XLA path (``core.lbm_step``) for other shapes.
    """
    _q, ny, nx = f.shape
    if nx % 128 or ny % 8:
        raise ValueError(
            f"Pallas LBM needs NX%128==0 and NY%8==0, got {ny}x{nx}")
    scal = jnp.stack([jnp.asarray(u0, f.dtype), jnp.asarray(tau, f.dtype)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        partial(_kernel, steps=steps),
        out_shape=jax.ShapeDtypeStruct(f.shape, f.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(scal, f, solid)
