"""D2Q9 lattice-Boltzmann core: fused stream-collide step.

Functional port of the semantics of the reference's WebGL2 fragment shader
``STEP_FS_SRC`` (reference pages/airfoil_flow_lbm_aerolab.html:222-360):

- gather-form streaming (each cell pulls f_i from x - e_i),
- half-way bounce-back when the streaming source is solid (html:325-334),
- solid cells store their own reversed populations (html:287-294),
- zero-gradient outflow at the right edge with macro recompute
  (html:301-312),
- equilibrium inlet/top/bottom at (rho=1, u=(U0,0)) (html:314-321),
- BGK collision with the stability clamps rho in [0.5, 2], |u| <= 0.35
  (html:344-351).

The step body is written against an injectable ``roll2`` primitive so the
exact same arithmetic runs as plain XLA (``jnp.roll``) and inside the
Pallas TPU kernel (``pltpu.roll``), and the two paths are tested for
bit-level agreement.

Layout: ``f`` is (9, NY, NX) float32 — NY on sublanes, NX on lanes. The
whole lattice state for the default grid is ~2.7 MB and lives in VMEM for
the Pallas path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "D2Q9_E", "D2Q9_W", "D2Q9_OPP",
    "equilibrium", "equilibrium_init", "step_body", "lbm_step",
    "macro_fields",
]

# Direction set (ex, ey), matching the reference shader's dir(i)
# (html:238-249): 0 rest; 1..4 axis; 5..8 diagonals.
D2Q9_E = np.array(
    [(0, 0), (1, 0), (0, 1), (-1, 0), (0, -1),
     (1, 1), (-1, 1), (-1, -1), (1, -1)], dtype=np.int32)
D2Q9_W = np.array(
    [4 / 9] + [1 / 9] * 4 + [1 / 36] * 4, dtype=np.float32)
D2Q9_OPP = np.array([0, 3, 4, 1, 2, 7, 8, 5, 6], dtype=np.int32)


def equilibrium(rho, ux, uy):
    """BGK equilibrium for all 9 directions; returns (9, ...) stacked."""
    uu = ux * ux + uy * uy
    fs = []
    for i in range(9):
        ex, ey = float(D2Q9_E[i, 0]), float(D2Q9_E[i, 1])
        eu = ex * ux + ey * uy
        fs.append(D2Q9_W[i] * rho * (1.0 + 3.0 * eu + 4.5 * eu * eu - 1.5 * uu))
    return jnp.stack(fs)


def equilibrium_init(ny: int, nx: int, u0: float, dtype=jnp.float32):
    """Uniform-freestream initial distributions (reference html:468-485)."""
    rho = jnp.ones((ny, nx), dtype)
    ux = jnp.full((ny, nx), u0, dtype)
    uy = jnp.zeros((ny, nx), dtype)
    return equilibrium(rho, ux, uy)


def macro_fields(f):
    """(rho, ux, uy) from a (9, NY, NX) distribution stack."""
    rho = jnp.sum(f, axis=0)
    inv = 1.0 / rho
    ux = (f[1] + f[5] + f[8] - f[3] - f[6] - f[7]) * inv
    uy = (f[2] + f[5] + f[6] - f[4] - f[7] - f[8]) * inv
    return rho, ux, uy


def _jnp_roll2(a, dy, dx):
    if dy:
        a = jnp.roll(a, dy, axis=0)
    if dx:
        a = jnp.roll(a, dx, axis=1)
    return a


def boundary_masks(ny: int, nx: int):
    """(is_outlet, is_edge_eq) masks for a full (unsharded) grid.

    Outlet wins at the right-edge corners (shader branch order,
    html:296-321: solid, then outlet, then inlet/top/bottom).
    """
    col = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
    is_outlet = col == nx - 1
    is_edge_eq = ((col == 0) | (row == 0) | (row == ny - 1)) & ~is_outlet
    return is_outlet, is_edge_eq


def bounce_masks(solid, roll2=_jnp_roll2):
    """Per-direction bounce-back selection masks, loop-invariant in time.

    ``bounce[i]`` is True where direction i's incoming population must be
    replaced by the cell's own reversed population: either the streaming
    source cell is solid (half-way bounce-back, html:325-334) or the cell
    itself is solid (solid cells hold reversed populations, html:287-294).
    The solid mask never changes between steps, so hoisting these 8 rolls
    (+ the merged select) out of the K-step fused loop removes ~1/3 of the
    per-step roll traffic in the Pallas kernel."""
    is_solid = solid > 0.5
    out = []
    for i in range(9):
        ex, ey = int(D2Q9_E[i, 0]), int(D2Q9_E[i, 1])
        if ex == 0 and ey == 0:
            out.append(is_solid)
        else:
            out.append((roll2(solid, ey, ex) > 0.5) | is_solid)
    return tuple(out)


def step_body(f, solid, u0, tau, roll2=_jnp_roll2, masks=None,
              u_max=0.35, rho_min=0.5, rho_max=2.0, bounce=None):
    """One fused stream+BC+collide step. ``f``: (9, NY, NX); ``solid``:
    (NY, NX) float {0,1}. ``masks``: optional precomputed
    (is_outlet, is_edge_eq) — required when rows are a shard of a larger
    grid (local iota would misplace the global edges). ``bounce``: optional
    precomputed ``bounce_masks`` (they are time-invariant; callers running
    K fused steps hoist them out of the loop). Returns the next
    (9, NY, NX)."""
    ny, nx = f.shape[1], f.shape[2]
    dtype = f.dtype

    is_outlet, is_edge_eq = masks if masks is not None else boundary_masks(ny, nx)
    is_solid = solid > 0.5
    if bounce is None:
        bounce = bounce_masks(solid, roll2)

    # Stream (gather): value at x comes from x - e_i => roll by +e_i.
    # Grid row index increases with +y, so a +ey shift is a +axis0 roll.
    # Everything below is organised per-direction over 2-D (NY, NX) planes:
    # Mosaic's vector layouts dislike stacked-scalar broadcasts, and the
    # per-plane form lowers cleanly both in XLA and in the Pallas kernel.
    fin = []
    for i in range(9):
        ex, ey = int(D2Q9_E[i, 0]), int(D2Q9_E[i, 1])
        streamed = roll2(f[i], ey, ex)
        # Bounce-back when the source cell or the cell itself is solid
        # (precomputed mask; identical arithmetic to the two-select form).
        v = jnp.where(bounce[i], f[D2Q9_OPP[i]], streamed)
        # Zero-gradient outflow: copy the left neighbour's pre-stream state
        # (html:301-312).
        v = jnp.where(is_outlet, roll2(f[i], 0, 1), v)
        fin.append(v)

    rho = fin[0]
    for i in range(1, 9):
        rho = rho + fin[i]
    inv = 1.0 / rho
    ux = (fin[1] + fin[5] + fin[8] - fin[3] - fin[6] - fin[7]) * inv
    uy = (fin[2] + fin[5] + fin[6] - fin[4] - fin[7] - fin[8]) * inv

    # Stability net (html:344-351).
    rho_c = jnp.clip(rho, rho_min, rho_max)
    spd = jnp.sqrt(ux * ux + uy * uy)
    scale = jnp.where(spd > u_max, u_max / jnp.maximum(spd, 1e-12), 1.0)
    ux_c = ux * scale
    uy_c = uy * scale

    uu = ux_c * ux_c + uy_c * uy_c
    u0f = jnp.asarray(u0, dtype)
    inv_tau = 1.0 / tau
    skip_collide = is_solid | is_outlet
    apply_edge = is_edge_eq & ~is_solid

    out = []
    for i in range(9):
        ex, ey = float(D2Q9_E[i, 0]), float(D2Q9_E[i, 1])
        w = float(D2Q9_W[i])
        eu = ex * ux_c + ey * uy_c
        feq = w * rho_c * (1.0 + 3.0 * eu + 4.5 * eu * eu - 1.5 * uu)
        fo = fin[i] - (fin[i] - feq) * inv_tau
        # Equilibrium inlet/top/bottom at (rho=1, u=(U0, 0)), html:314-321.
        eu0 = ex * u0f
        feq_in = w * (1.0 + 3.0 * eu0 + 4.5 * eu0 * eu0 - 1.5 * u0f * u0f)
        v = jnp.where(skip_collide, fin[i], fo)
        v = jnp.where(apply_edge, feq_in, v)
        out.append(v)
    return jnp.stack(out)


@partial(jax.jit, static_argnames=("steps",))
def lbm_step(f, solid, u0, tau, steps: int = 1):
    """Advance ``steps`` fused stream-collide steps (XLA path)."""
    bounce = bounce_masks(solid)

    def body(_, fc):
        return step_body(fc, solid, u0, tau, bounce=bounce)
    return jax.lax.fori_loop(0, steps, body, f)
