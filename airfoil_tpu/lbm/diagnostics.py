"""On-device LBM diagnostics: forces, separation fraction, render fields.

Vectorised equivalents of the reference's CPU readback loops:
``computeForces`` (pages/airfoil_flow_lbm_aerolab.html:643-684) sums lattice
pressure p = rho/3 over solid-cell faces adjacent to fluid, nondimensionalised
by 0.5 U0^2 chord_cells; the separation fraction (html:686-699) is the share
of surface-adjacent fluid cells with reversed streamwise flow. Here both are
single fused reductions on device — no host round-trip per frame.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from airfoil_tpu.lbm.core import macro_fields

__all__ = ["forces_and_separation", "render_fields"]

_FACES = ((0, 1), (1, 0), (0, -1), (-1, 0))  # (dy, dx)


@partial(jax.jit, static_argnames=("chord_cells",))
def forces_and_separation(f, solid, u0, chord_cells: float):
    """Returns (cl, cd, sep_fraction) from the current lattice state."""
    rho, ux, _uy = macro_fields(f)
    p = rho / 3.0
    is_solid = solid > 0.5

    fx = 0.0
    fy = 0.0
    surf = 0.0
    rev = 0.0
    for dy, dx in _FACES:
        # Neighbour cell at (y+dy, x+dx) as seen from each solid cell.
        nb_solid = jnp.roll(is_solid, (-dy, -dx), axis=(0, 1))
        nb_p = jnp.roll(p, (-dy, -dx), axis=(0, 1))
        nb_ux = jnp.roll(ux, (-dy, -dx), axis=(0, 1))
        face = is_solid & ~nb_solid
        # Force on the body points from the fluid into the solid: -d.
        fx = fx + jnp.sum(jnp.where(face, nb_p, 0.0)) * (-dx)
        fy = fy + jnp.sum(jnp.where(face, nb_p, 0.0)) * (-dy)
        surf = surf + jnp.sum(face)
        rev = rev + jnp.sum(face & (nb_ux < 0.0))

    q = 0.5 * u0 * u0 * chord_cells
    cl = fy / q
    cd = fx / q
    sep = rev / jnp.maximum(surf, 1.0)
    return cl, cd, sep


@jax.jit
def render_fields(f, solid, u0):
    """Normalised (speed, cp, vorticity) fields for visualisation.

    Matches the reference render shader's definitions (html:395-420):
    speed |u|/U0, Cp = (rho-1)/(1.5 U0^2), central-difference vorticity.
    Solid cells are NaN-masked for the client colormap.
    """
    rho, ux, uy = macro_fields(f)
    is_solid = solid > 0.5
    speed = jnp.sqrt(ux * ux + uy * uy) / u0
    cp = (rho - 1.0) / (1.5 * u0 * u0)
    dvydx = 0.5 * (jnp.roll(uy, -1, axis=1) - jnp.roll(uy, 1, axis=1))
    duxdy = 0.5 * (jnp.roll(ux, -1, axis=0) - jnp.roll(ux, 1, axis=0))
    vort = dvydx - duxdy
    nanmask = jnp.where(is_solid, jnp.nan, 1.0)
    return speed * nanmask, cp * nanmask, vort * nanmask, ux * nanmask, uy * nanmask
