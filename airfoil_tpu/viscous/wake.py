"""Wake influence operator for the viscous-inviscid coupling.

Body-only transpiration recovers only a fraction of the viscous lift
decrement: most of XFOIL's CL reduction enters through the wake's
displacement surface, which relaxes the rear-stagnation loading enforced by
the Kutta condition. This module builds the linear maps that add a source
sheet along a straight freestream-aligned wake line behind the trailing
edge:

- ``dvt_dsigw``: wake sigma -> body surface tangential velocity (through the
  vortex system: the wake's normal-velocity footprint on the body is
  cancelled by a gamma adjustment, exactly like body transpiration).
- ``uw0 / wb / ww``: the wake centerline edge velocity as an affine function
  of (body sigma, wake sigma) for the wake march.

Everything is linear in the source strengths because sources never enter
the system matrix, only the right-hand side; the LU factors from
``build_operator`` are reused. The reference's XFOIL binary builds the
equivalent coupled influence system internally (it is what ``VISC`` mode
iterates on, reference main.py:362-366).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from airfoil_tpu.inviscid.panel_solver import (
    InviscidOperator,
    _freestream,
    _gamma_columns,
    _kernels,
    _local_frame,
    _refined_solve,
    _to_global,
)
from airfoil_tpu.paneling import Paneling, panel_geometry

__all__ = ["WakeOperator", "build_wake_operator"]


class WakeOperator(NamedTuple):
    wpan: Paneling            # wake-line paneling (Mw panels)
    xi: jnp.ndarray           # (Mw,) arc distance of wake midpoints from TE
    dvt_dsigw: jnp.ndarray    # (N, Mw) body Vt sensitivity to wake sigma
    uw0: jnp.ndarray          # (Mw,) wake Ue at zero transpiration
    wb: jnp.ndarray           # (Mw, N) wake Ue sensitivity to body sigma
    ww: jnp.ndarray           # (Mw, Mw) wake Ue sensitivity to wake sigma


def _source_maps(px, py, pan: Paneling, self_mask=None):
    """Global-frame (u, v) per unit source strength of ``pan``'s panels."""
    xi, eta, l = _local_frame(px, py, pan)
    _u_c, _v_c, _u_r, _v_r, u_s, v_s = _kernels(xi, eta, l, self_mask)
    return _to_global(u_s, v_s, pan)


def _vortex_maps(px, py, pan: Paneling, self_mask=None):
    """Global-frame (u, v) per unit nodal vorticity (gamma columns)."""
    xi, eta, l = _local_frame(px, py, pan)
    u_c, v_c, u_r, v_r, _u_s, _v_s = _kernels(xi, eta, l, self_mask)
    ua, va = _to_global(u_c - u_r, v_c - v_r, pan)
    ub, vb = _to_global(u_r, v_r, pan)
    return (_gamma_columns(ua, ub), _gamma_columns(va, vb))


def build_wake_operator(
    op: InviscidOperator,
    alpha_deg: jnp.ndarray,
    n_wake: int = 32,
    wake_length: float = 1.0,
) -> WakeOperator:
    """Build the wake line and its influence maps for one alpha."""
    pan = op.pan
    n = pan.xm.shape[0]
    dtype = pan.xm.dtype
    uinf, vinf = _freestream(alpha_deg)

    # Straight wake from the TE midpoint along the freestream direction,
    # clustered near the TE.
    te_x = 0.5 * (pan.xp[0] + pan.xp[-1])
    te_y = 0.5 * (pan.yp[0] + pan.yp[-1])
    u = jnp.linspace(0.0, 1.0, n_wake + 1, dtype=dtype)
    frac = u**1.4
    wx = te_x + wake_length * frac * uinf
    wy = te_y + wake_length * frac * vinf
    # Nudge the first node slightly off the TE so body-panel kernels stay
    # regular at the wake's first control point.
    wx = wx.at[0].add(1e-4 * uinf)
    wy = wy.at[0].add(1e-4 * vinf)
    wpan = panel_geometry(wx, wy)
    xi = 0.5 * (wpan.s[:-1] + wpan.s[1:])

    # Wake sigma -> body Vt (via RHS-only gamma adjustment).
    us_b, vs_b = _source_maps(pan.xm, pan.ym, wpan)      # (N, Mw)
    bn_w = us_b * pan.nx[:, None] + vs_b * pan.ny[:, None]
    bt_w = us_b * pan.tx[:, None] + vs_b * pan.ty[:, None]
    rhs = jnp.concatenate([-bn_w, jnp.zeros((1, n_wake), dtype)], axis=0)
    g_w = _refined_solve(op.a_full, op.lu, op.piv, rhs)  # (N+1, Mw)
    at_full = _gamma_columns(op.at_a, op.at_b)
    dvt_dsigw = at_full @ g_w + bt_w

    # Velocities at the wake midpoints, projected on the wake tangent.
    ug_w, vg_w = _vortex_maps(wpan.xm, wpan.ym, pan)     # (Mw, N+1)
    tg_w = ug_w * wpan.tx[:, None] + vg_w * wpan.ty[:, None]
    us_bw, vs_bw = _source_maps(wpan.xm, wpan.ym, pan)   # body sigma
    tb_w = us_bw * wpan.tx[:, None] + vs_bw * wpan.ty[:, None]
    self_mask = jnp.eye(n_wake, dtype=bool)
    us_ww, vs_ww = _source_maps(wpan.xm, wpan.ym, wpan, self_mask)
    tw_w = us_ww * wpan.tx[:, None] + vs_ww * wpan.ty[:, None]

    t_free = uinf * wpan.tx + vinf * wpan.ty
    # gamma = gamma0 + dgamma_dsigma sigma_b + g_w sigma_w
    rhs0 = jnp.concatenate(
        [-(uinf * pan.nx + vinf * pan.ny), jnp.zeros((1,), dtype)]
    )
    gamma0 = _refined_solve(op.a_full, op.lu, op.piv, rhs0)
    uw0 = t_free + tg_w @ gamma0
    wb = tg_w @ op.dgamma_dsigma + tb_w
    ww = tg_w @ g_w + tw_w

    return WakeOperator(wpan, xi, dvt_dsigw, uw0, wb, ww)
