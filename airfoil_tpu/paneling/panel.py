"""Differentiable paneling stage.

Resamples a parsed coordinate loop onto N cosine-spaced panels in arc length
and computes midpoints/tangents/normals/lengths. The reference performs this
re-paneling twice, host-side (NumPy vortex solver at
pages/Airfoil_Analysis.py:66-81 and the LBM geometry pipeline at
pages/airfoil_flow_lbm_aerolab.html:142-157); here it is a single JAX stage
shared by the panel solver, the viscous march, and the LBM rasterizer, and is
differentiable end-to-end (geometry gradients come free for design loops).

All shapes are static: input loops of arbitrary point count are interpolated
to ``n_panels + 1`` nodes, so everything downstream jits once.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = [
    "Paneling",
    "repanel",
    "panel_geometry",
    "rotate_about_quarter_chord",
]


class Paneling(NamedTuple):
    """Panel discretisation of an airfoil loop (Selig order, TE->...->TE).

    ``xp, yp``: (N+1,) node coordinates. ``xm, ym``: (N,) collocation points
    (panel midpoints). ``tx, ty``: unit tangents along traversal direction.
    ``nx, ny``: unit *inward* normals (same convention as the reference
    frontend, Airfoil_Analysis.py:79-80). ``length``: panel lengths. ``s``:
    (N+1,) node arc-length stations.
    """

    xp: jnp.ndarray
    yp: jnp.ndarray
    xm: jnp.ndarray
    ym: jnp.ndarray
    tx: jnp.ndarray
    ty: jnp.ndarray
    nx: jnp.ndarray
    ny: jnp.ndarray
    length: jnp.ndarray
    s: jnp.ndarray


def _arc_length(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    seg = jnp.hypot(jnp.diff(x), jnp.diff(y))
    return jnp.concatenate([jnp.zeros((1,), x.dtype), jnp.cumsum(seg)])


def repanel(
    coords: jnp.ndarray,
    n_panels: int = 160,
    spacing: str = "airfoil",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Resample a (M, 2) loop onto ``n_panels + 1`` arc-length stations.

    ``spacing='airfoil'`` (default) clusters nodes at the trailing edge AND
    at the leading edge (located as the arc position of minimum x) with a
    per-side cosine law — the same role as XFOIL's ``PANE`` LE/TE bunching.
    ``'cosine'`` is a single cosine over the whole arc (the reference
    frontend's choice, Airfoil_Analysis.py:66-81); ``'uniform'`` is the
    reference's ill-conditioning fallback (Airfoil_Analysis.py:115-144).
    """
    coords = jnp.asarray(coords)
    x, y = coords[:, 0], coords[:, 1]
    arc = _arc_length(x, y)
    total = arc[-1]
    if spacing == "cosine":
        beta = jnp.linspace(0.0, jnp.pi, n_panels + 1)
        s_new = total * 0.5 * (1.0 - jnp.cos(beta))
    elif spacing == "uniform":
        s_new = jnp.linspace(0.0, total, n_panels + 1)
    elif spacing == "airfoil":
        if n_panels % 2:
            raise ValueError("'airfoil' spacing requires an even n_panels")
        half = n_panels // 2
        s_le = arc[jnp.argmin(x)]
        beta = jnp.linspace(0.0, jnp.pi, half + 1)
        ramp = 0.5 * (1.0 - jnp.cos(beta))
        s_up = s_le * ramp
        s_lo = s_le + (total - s_le) * ramp
        s_new = jnp.concatenate([s_up, s_lo[1:]])
    else:
        raise ValueError(f"unknown spacing {spacing!r}")
    xp = jnp.interp(s_new, arc, x)
    yp = jnp.interp(s_new, arc, y)
    return xp, yp


def panel_geometry(xp: jnp.ndarray, yp: jnp.ndarray) -> Paneling:
    """Compute midpoints, tangents, inward normals, and lengths."""
    dx = jnp.diff(xp)
    dy = jnp.diff(yp)
    length = jnp.hypot(dx, dy) + 1e-14
    tx = dx / length
    ty = dy / length
    # Inward normal: with Selig (counterclockwise) traversal the interior is
    # to the left of the tangent, i.e. (-ty, tx).
    nx = -ty
    ny = tx
    xm = 0.5 * (xp[:-1] + xp[1:])
    ym = 0.5 * (yp[:-1] + yp[1:])
    s = _arc_length(xp, yp)
    return Paneling(xp, yp, xm, ym, tx, ty, nx, ny, length, s)


def rotate_about_quarter_chord(
    coords: jnp.ndarray, alpha_deg: jnp.ndarray
) -> jnp.ndarray:
    """Rotate a loop by -alpha about (0.25, 0).

    Matches the LBM geometry pipeline's convention (reference html:133-140):
    positive angle of attack pitches the nose up while the freestream stays
    axis-aligned.
    """
    a = -jnp.deg2rad(alpha_deg)
    ca, sa = jnp.cos(a), jnp.sin(a)
    px, py = 0.25, 0.0
    dx = coords[..., 0] - px
    dy = coords[..., 1] - py
    return jnp.stack(
        [px + dx * ca - dy * sa, py + dx * sa + dy * ca], axis=-1
    )
