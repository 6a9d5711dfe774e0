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
    _te_maps,
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
    """Global-frame (u, v) per unit nodal vorticity (gamma columns),
    including the TE gap panel's contribution to columns 0 / N."""
    xi, eta, l = _local_frame(px, py, pan)
    u_c, v_c, u_r, v_r, _u_s, _v_s = _kernels(xi, eta, l, self_mask)
    ua, va = _to_global(u_c - u_r, v_c - v_r, pan)
    ub, vb = _to_global(u_r, v_r, pan)
    ug, vg = _gamma_columns(ua, ub), _gamma_columns(va, vb)
    u_te, v_te = _te_maps(px, py, pan)
    ug = ug.at[:, 0].add(u_te).at[:, -1].add(-u_te)
    vg = vg.at[:, 0].add(v_te).at[:, -1].add(-v_te)
    return ug, vg


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

    # Wake line from the TE midpoint, clustered near the TE. The
    # DIRECTION matters for the viscous lift decrement: the physical wake
    # leaves along the TE streamline — initially the bisector of the TE
    # wedge (XFOIL traces its wake from the inviscid TE streamline), NOT
    # the freestream. A freestream-aligned wake at alpha = 8 deg sits 8
    # deg above the TE streamline and its displacement body then fails to
    # relax the rear loading (measured: viscous CL within 0.5% of
    # inviscid). The trajectory here leaves along the TE bisector and
    # curves to the freestream direction over the wake length.
    te_x = 0.5 * (pan.xp[0] + pan.xp[-1])
    te_y = 0.5 * (pan.yp[0] + pan.yp[-1])
    # TE bisector: mean of the last panel directions, pointing downstream.
    # Panel 0 runs TE->LE on the upper side (reverse it), panel N-1 runs
    # LE->TE on the lower side.
    bx = 0.5 * (-pan.tx[0] + pan.tx[n - 1])
    by = 0.5 * (-pan.ty[0] + pan.ty[n - 1])
    bnorm = jnp.maximum(jnp.hypot(bx, by), 1e-6)
    bx, by = bx / bnorm, by / bnorm
    u = jnp.linspace(0.0, 1.0, n_wake + 1, dtype=dtype)
    frac = u**1.4
    # Direction blends bisector -> freestream with arc fraction; the
    # cumulative path is integrated so the polyline stays smooth.
    w_dir = frac**0.7
    dxs = (1.0 - w_dir) * bx + w_dir * uinf
    dys = (1.0 - w_dir) * by + w_dir * vinf
    dnorm = jnp.maximum(jnp.hypot(dxs, dys), 1e-6)
    dxs, dys = dxs / dnorm, dys / dnorm
    dfrac = jnp.diff(frac)
    step_x = 0.5 * (dxs[:-1] + dxs[1:]) * dfrac * wake_length
    step_y = 0.5 * (dys[:-1] + dys[1:]) * dfrac * wake_length
    wx = te_x + jnp.concatenate([jnp.zeros((1,), dtype),
                                 jnp.cumsum(step_x)])
    wy = te_y + jnp.concatenate([jnp.zeros((1,), dtype),
                                 jnp.cumsum(step_y)])
    # Nudge the first node slightly off the TE so body-panel kernels stay
    # regular at the wake's first control point.
    wx = wx.at[0].add(1e-4 * bx)
    wy = wy.at[0].add(1e-4 * by)
    wpan = panel_geometry(wx, wy)
    xi = 0.5 * (wpan.s[:-1] + wpan.s[1:])

    # Wake sigma -> body Vt (via RHS-only gamma adjustment).
    us_b, vs_b = _source_maps(pan.xm, pan.ym, wpan)      # (N, Mw)
    bn_w = us_b * pan.nx[:, None] + vs_b * pan.ny[:, None]
    # Sharp-TE row replacement: the vortex system's last tangency row was
    # blended away; its RHS rows scale identically (see
    # panel_solver.build_operator rhs_scale).
    bn_w = bn_w * op.rhs_scale[:, None]
    bt_w = us_b * pan.tx[:, None] + vs_b * pan.ty[:, None]
    rhs = jnp.concatenate([-bn_w, jnp.zeros((1, n_wake), dtype)], axis=0)
    g_w = _refined_solve(op.a_full, op.lu, op.piv, rhs)  # (N+1, Mw)
    dvt_dsigw = op.at_full @ g_w + bt_w

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


def blend_te_continuity(xi, ue_w, ue_te):
    """Blend the sampled wake edge velocities toward the body TE value.

    Potential-flow evaluation within ~0.1c behind the TE sits in the TE
    panels' near-field (concentrated vorticity + the gap) and reads a
    spurious centerline dip — measured 0.82 at xi = 0.007 against a body
    TE edge velocity of 0.94 on naca0012@1e6@alpha=0. The wake momentum
    equation then sees a fake 15% velocity jump right behind the TE and
    sheds ~half the momentum deficit across it ((ue1/ue2)^(2+H)),
    halving Squire-Young CD. Physically the wake edge velocity is
    CONTINUOUS with the TE boundary-layer edge velocity (XFOIL
    initialises its first wake point from the body TE state for the same
    reason). ``ue_te`` must be the SAME TE edge velocity the boundary
    layer marches with (the station-sampled, displacement-carrying
    value) — blending toward any other near-TE sample re-introduces a
    jump. Linear in its inputs, so the structured-Jacobian chain stays
    exact.
    """
    w = jnp.clip(xi / 0.15, 0.0, 1.0)
    w = w * w * (3.0 - 2.0 * w)
    return (1.0 - w) * ue_te + w * ue_w
