"""Off-body flow-field computation for visualisation.

Replaces the reference frontend's NumPy constant-strength vortex solver
(pages/Airfoil_Analysis.py:45-216) with the framework's own linear-vortex
solution evaluated on a grid: one batched influence evaluation for the
velocity field (vs the reference's per-panel Python loop), matplotlib-Path
interior masking, and an RK2 streamline tracer with the reference's
parameters (22 seed lines, 800 steps, dt=0.004 — Airfoil_Analysis.py:181-216).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from airfoil_tpu.inviscid.panel_solver import (
    InviscidOperator,
    build_operator,
    solve_inviscid,
    velocity_at_points,
)
from airfoil_tpu.paneling import panel_geometry, repanel

__all__ = ["FlowField", "compute_flow_field"]


class FlowField(NamedTuple):
    x: np.ndarray            # (G,) grid x
    y: np.ndarray            # (G,) grid y
    speed: np.ndarray        # (G, G) |V|, NaN inside body
    u: np.ndarray
    v: np.ndarray
    streamlines: list        # list of (xs, ys) polylines
    coords: np.ndarray       # the input loop
    cl: float
    cp_min: float


def compute_flow_field(
    coords,
    alpha_deg: float,
    n_streamlines: int = 22,
    grid_res: int = 220,
    n_panels: int = 160,
) -> FlowField:
    """Velocity field + streamlines around the airfoil at one alpha."""
    from matplotlib.path import Path as MplPath

    coords = np.asarray(coords, np.float64)
    xp, yp = repanel(jnp.asarray(coords, jnp.float32), n_panels)
    pan = panel_geometry(xp, yp)
    op = build_operator(pan)
    sol = solve_inviscid(op, float(alpha_deg))

    chord = coords[:, 0].max() - coords[:, 0].min()
    pad = 0.60 * chord
    x_arr = np.linspace(coords[:, 0].min() - pad, coords[:, 0].max() + pad,
                        grid_res)
    y_arr = np.linspace(coords[:, 1].min() - pad, coords[:, 1].max() + pad,
                        grid_res)
    xg, yg = np.meshgrid(x_arr, y_arr)

    u, v = velocity_at_points(
        jnp.asarray(xg.ravel(), jnp.float32),
        jnp.asarray(yg.ravel(), jnp.float32),
        op, sol.gamma, float(alpha_deg))
    u = np.asarray(u, np.float64).reshape(grid_res, grid_res)
    v = np.asarray(v, np.float64).reshape(grid_res, grid_res)

    path = MplPath(coords)
    inside = path.contains_points(
        np.c_[xg.ravel(), yg.ravel()], radius=-1e-4
    ).reshape(grid_res, grid_res)

    speed = np.hypot(u, v)
    outside_vals = speed[~inside]
    # Same percentile clip as the reference (99.99th, Airfoil_Analysis.py:202)
    p999 = float(np.percentile(outside_vals, 99.99))
    speed = np.clip(speed, 0.0, p999)
    speed[inside] = 0.0
    u[inside] = np.nan
    v[inside] = np.nan

    def field_velocity(cx, cy):
        ix = int(np.clip(np.searchsorted(x_arr, cx) - 1, 0, grid_res - 2))
        iy = int(np.clip(np.searchsorted(y_arr, cy) - 1, 0, grid_res - 2))
        fx = (cx - x_arr[ix]) / (x_arr[ix + 1] - x_arr[ix] + 1e-12)
        fy = (cy - y_arr[iy]) / (y_arr[iy + 1] - y_arr[iy] + 1e-12)
        uu = (u[iy, ix] * (1 - fx) * (1 - fy) + u[iy, ix + 1] * fx * (1 - fy)
              + u[iy + 1, ix] * (1 - fx) * fy + u[iy + 1, ix + 1] * fx * fy)
        vv = (v[iy, ix] * (1 - fx) * (1 - fy) + v[iy, ix + 1] * fx * (1 - fy)
              + v[iy + 1, ix] * (1 - fx) * fy + v[iy + 1, ix + 1] * fx * fy)
        return float(uu), float(vv)

    streamlines = []
    dt = 0.004
    for ys in np.linspace(y_arr[0] + 0.03, y_arr[-1] - 0.03, n_streamlines):
        px, py = [x_arr[0] + 0.02], [ys]
        for _ in range(800):
            cx, cy = px[-1], py[-1]
            if not (x_arr[0] <= cx <= x_arr[-1]
                    and y_arr[0] <= cy <= y_arr[-1]):
                break
            uu, vv = field_velocity(cx, cy)
            spd = float(np.hypot(uu, vv))
            if np.isnan(uu) or np.isnan(vv) or spd < 1e-6:
                break
            nx_pt, ny_pt = cx + dt * uu, cy + dt * vv
            if path.contains_points([[nx_pt, ny_pt]], radius=-1e-4)[0]:
                break
            px.append(nx_pt)
            py.append(ny_pt)
        if len(px) > 5:
            streamlines.append((px, py))

    return FlowField(x=x_arr, y=y_arr, speed=speed, u=u, v=v,
                     streamlines=streamlines, coords=coords,
                     cl=float(sol.cl), cp_min=float(sol.cp.min()))
