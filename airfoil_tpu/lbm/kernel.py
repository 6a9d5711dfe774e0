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

from airfoil_tpu.lbm.core import bounce_masks, step_body

__all__ = ["lbm_steps_pallas", "lbm_steps_pallas_tiled"]


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
    # Solid-geometry rolls are time-invariant: hoist all 8 out of the
    # K-step fused loop (~1/3 of the per-step roll traffic).
    bounce = bounce_masks(solid, roll2=_pltpu_roll2)

    def body(_, f):
        return step_body(f, solid, u0, tau, roll2=_pltpu_roll2,
                         bounce=bounce)

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


def _tiled_kernel(scal_ref, f_hbm, solid_hbm, out_hbm,
                  fwin, swin, sems, *, steps, tile_rows, ny, nx):
    """One row-strip: DMA halo window in, K fused steps, DMA interior out.

    Window = tile_rows + 2*steps rows, clamped to the grid. Correctness of
    the clamped/rolled window is exact, not approximate:
    - pltpu.roll wrap-around contaminates one halo ring per step, so after
      ``steps`` steps the contamination reaches exactly the first interior
      row boundary and never enters the rows written out;
    - the physical top/bottom rows are Dirichlet (equilibrium inlet) every
      step, so a clamped window loses nothing at the grid edges;
    - boundary masks are built from GLOBAL row indices (w0 + iota), so edge
      handling inside a strip matches the full-grid XLA step bit-for-bit.
    """
    i = pl.program_id(0)
    u0 = scal_ref[0]
    tau = scal_ref[1]
    # Halo rounded up to the 8-row float32 sublane tile: dynamic HBM slice
    # starts must be tile-aligned, and an 8-row halo costs little extra DMA
    # while satisfying any steps <= 8.
    halo = ((steps + 7) // 8) * 8
    win = tile_rows + 2 * halo

    w0 = jnp.clip(i * tile_rows - halo, 0, ny - win)
    w0 = pl.multiple_of(w0, 8)
    off = i * tile_rows - w0          # interior offset inside the window

    cp_f = pltpu.make_async_copy(
        f_hbm.at[:, pl.ds(w0, win), :], fwin, sems.at[0])
    cp_s = pltpu.make_async_copy(
        solid_hbm.at[pl.ds(w0, win), :], swin, sems.at[1])
    cp_f.start()
    cp_s.start()
    cp_f.wait()
    cp_s.wait()

    row = w0 + jax.lax.broadcasted_iota(jnp.int32, (win, nx), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (win, nx), 1)
    is_outlet = col == nx - 1
    is_edge_eq = ((col == 0) | (row == 0) | (row == ny - 1)) & ~is_outlet

    fcur = fwin[:]
    solid = swin[:]
    bounce = bounce_masks(solid, roll2=_pltpu_roll2)
    for _ in range(steps):
        fcur = step_body(fcur, solid, u0, tau, roll2=_pltpu_roll2,
                         masks=(is_outlet, is_edge_eq), bounce=bounce)

    # Mosaic cannot dynamic-slice a vector value; round-trip through the
    # window scratch ref and DMA the interior rows out with a ref slice.
    fwin[:] = fcur
    cp_o = pltpu.make_async_copy(
        fwin.at[:, pl.ds(pl.multiple_of(off, 8), tile_rows), :],
        out_hbm.at[:, pl.ds(i * tile_rows, tile_rows), :], sems.at[2])
    cp_o.start()
    cp_o.wait()


@partial(jax.jit, static_argnames=("steps", "tile_rows"))
def lbm_steps_pallas_tiled(f, solid, u0, tau, steps: int = 4,
                           tile_rows: int = 32):
    """Advance ``steps`` LBM steps with a row-strip halo decomposition.

    Breaks the VMEM-resident kernel's ~640x384 grid cap: the lattice lives
    in HBM and each grid strip (tile_rows + 2*steps rows, full NX width)
    streams through VMEM, so HBM traffic is one read + one write per BATCH
    of ``steps`` — the same fusion the resident kernel gets, at any NY.
    Requirements: NX % 128 == 0, NY % tile_rows == 0, tile_rows % 8 == 0,
    NY >= tile_rows + 2*steps. Bit-equal to ``core.lbm_step`` (tested).
    """
    q, ny, nx = f.shape
    halo = ((steps + 7) // 8) * 8
    if nx % 128 or tile_rows % 8 or ny % tile_rows or \
            ny < tile_rows + 2 * halo:
        raise ValueError(
            f"tiled Pallas LBM needs NX%128==0, NY%tile_rows==0, "
            f"tile_rows%8==0, NY>=tile_rows+2*halo; got {ny}x{nx} "
            f"tile_rows={tile_rows} steps={steps}")
    win = tile_rows + 2 * halo
    scal = jnp.stack([jnp.asarray(u0, f.dtype), jnp.asarray(tau, f.dtype)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ny // tile_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((q, win, nx), f.dtype),
            pltpu.VMEM((win, nx), f.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        partial(_tiled_kernel, steps=steps, tile_rows=tile_rows,
                ny=ny, nx=nx),
        out_shape=jax.ShapeDtypeStruct(f.shape, f.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(scal, f, solid)
