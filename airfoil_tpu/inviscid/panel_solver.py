"""Linear-strength vortex panel solver with source transpiration.

This is the TPU-native replacement for XFOIL's inviscid core (the reference
invokes it as a subprocess, main.py:328-519) and an accuracy upgrade over the
reference frontend's constant-strength vortex visualisation solver
(pages/Airfoil_Analysis.py:45-216). Formulation:

- Vorticity varies linearly over each panel (nodal strengths ``gamma``,
  N+1 unknowns for N panels), giving smooth Cp suitable for CL/Cm within
  panel-method accuracy of XFOIL's own linear-vortex scheme.
- Flow tangency is enforced at the N panel midpoints; the Kutta condition
  ``gamma[0] + gamma[N] = 0`` closes the system (same closure as the
  reference solver's last-row replacement, Airfoil_Analysis.py:108-112).
- Constant-strength *source* panels with known strengths ``sigma`` model
  boundary-layer transpiration; they enter the right-hand side only, so the
  influence operator factors once per geometry and every (alpha, sigma)
  solve is a cheap dense triangular solve — the building block the polar
  layer vmaps over.

Influence kernels are derived from the complex potentials
``w_const = -i/(2*pi) * log(z/(z-l))`` (unit vortex),
``w_ramp = -i/(2*pi*l) * (z*log(z/(z-l)) - l)`` (ramp vortex) and
``w_src = 1/(2*pi) * log(z/(z-l))`` (unit source) in panel-local
coordinates; the on-panel limit is taken from the exterior side
(eta -> 0-, interior normals point +eta).

Everything is batched matrix algebra: the (N+1)x(N+1) system build and the
dense solves map straight onto the MXU, and the whole module is
``vmap``-able over alpha/Re/geometry.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from airfoil_tpu.paneling import Paneling

__all__ = [
    "InviscidOperator",
    "InviscidSolution",
    "build_operator",
    "solve_inviscid",
    "velocity_at_points",
]

_TWO_PI = 2.0 * jnp.pi


def _local_frame(px, py, pan: Paneling):
    """Panel-local coordinates of points (P,) w.r.t. all panels (N,).

    Returns (xi, eta, length) each of shape (P, N).
    """
    dxp = px[:, None] - pan.xp[None, :-1]
    dyp = py[:, None] - pan.yp[None, :-1]
    c = pan.tx[None, :]
    s = pan.ty[None, :]
    xi = dxp * c + dyp * s
    eta = -dxp * s + dyp * c
    return xi, eta, pan.length[None, :]


def _kernels(xi, eta, l, self_mask=None):
    """Vortex (constant + ramp) and source kernels in panel-local coords.

    Returns ``(u_c, v_c, u_r, v_r, u_s, v_s)``, each (P, N), per unit
    strength. ``self_mask`` marks entries where the evaluation point is the
    panel's own midpoint; there the exterior-side analytic limit
    (theta-jump = +pi, log term = 0) is substituted.
    """
    r1sq = xi * xi + eta * eta + 1e-20
    r2sq = (xi - l) ** 2 + eta * eta + 1e-20
    theta1 = jnp.arctan2(eta, xi)
    theta2 = jnp.arctan2(eta, xi - l)
    delta = theta1 - theta2
    logr = 0.5 * jnp.log(r1sq / r2sq)
    if self_mask is not None:
        delta = jnp.where(self_mask, jnp.pi, delta)
        logr = jnp.where(self_mask, 0.0, logr)
    u_c = delta / _TWO_PI
    v_c = logr / _TWO_PI
    u_r = (xi * delta + eta * logr) / (_TWO_PI * l)
    v_r = (xi * logr - eta * delta - l) / (_TWO_PI * l)
    u_s = logr / _TWO_PI
    v_s = -delta / _TWO_PI
    return u_c, v_c, u_r, v_r, u_s, v_s


def _to_global(u, v, pan: Paneling):
    c = pan.tx[None, :]
    s = pan.ty[None, :]
    return u * c - v * s, u * s + v * c


class InviscidOperator(NamedTuple):
    """Geometry-dependent factorised influence operator.

    Built once per paneling; every (alpha, sigma) evaluation reuses it.

    ``a_full``: the (N+1, N+1) vortex system (kept for iterative-refinement
    residuals). ``lu, piv``: its LU factors.
    ``bn``: (N, N) source -> midpoint-normal-velocity influence.
    ``at_a, at_b``: (N, N) nodal-vortex -> midpoint-tangential influence
    (start / end node of each panel).
    ``bt``: (N, N) source -> midpoint-tangential influence.
    ``due_dsigma``: (N, N) edge-velocity sensitivity ``d(Vt)/d(sigma)`` —
    the mass-influence map used by the viscous-inviscid coupling.
    ``dgamma_dsigma``: (N+1, N) vorticity sensitivity to body sources
    (needed by the wake operator, which evaluates gamma-induced velocities
    off-body).
    """

    pan: Paneling
    a_full: jnp.ndarray
    lu: jnp.ndarray
    piv: jnp.ndarray
    bn: jnp.ndarray
    at_a: jnp.ndarray
    at_b: jnp.ndarray
    bt: jnp.ndarray
    due_dsigma: jnp.ndarray
    dgamma_dsigma: jnp.ndarray


class InviscidSolution(NamedTuple):
    """Result of one inviscid evaluation at a single alpha."""

    gamma: jnp.ndarray        # (N+1,) nodal vortex strengths
    vt: jnp.ndarray           # (N,) surface tangential velocity / U_inf
    cp: jnp.ndarray           # (N,) surface pressure coefficient
    cl: jnp.ndarray           # lift coefficient (Cp integration)
    cm: jnp.ndarray           # quarter-chord moment coefficient
    cd_pressure: jnp.ndarray  # pressure-drag residual (~0; discretisation)
    circulation: jnp.ndarray  # total bound circulation


def _gamma_columns(an_a, an_b):
    """Assemble per-node columns from per-panel (start, end) influences.

    Input (P, N) per-panel maps; output (P, N+1) per-node maps (interior
    nodes collect the end influence of one panel and the start influence of
    the next).
    """
    p, n = an_a.shape
    a = jnp.zeros((p, n + 1), an_a.dtype)
    a = a.at[:, :-1].add(an_a)
    a = a.at[:, 1:].add(an_b)
    return a


def _refined_solve(a_full, lu, piv, rhs, steps: int = 2):
    """LU solve with iterative refinement.

    The panel system's condition number is ~1e4 for closed sharp trailing
    edges (the NACA 6-series case the parser deliberately preserves,
    reference main.py:173-179): the two sliver TE panels make the TE
    tangency rows nearly dependent. An f32 factorisation — all the TPU's
    native LU supports — loses 3-4 digits there, so a couple of refinement
    passes with full-f32 residual matvecs (HIGHEST precision: no bf16
    shortcuts on the MXU) recover near-f32-roundoff accuracy.
    """
    x = jax.scipy.linalg.lu_solve((lu, piv), rhs)
    for _ in range(steps):
        r = rhs - jnp.dot(a_full, x, precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=x.dtype)
        x = x + jax.scipy.linalg.lu_solve((lu, piv), r)
    return x


def build_operator(pan: Paneling) -> InviscidOperator:
    """Build and factorise the influence operator for a paneling."""
    n = pan.xm.shape[0]
    self_mask = jnp.eye(n, dtype=bool)
    xi, eta, l = _local_frame(pan.xm, pan.ym, pan)
    u_c, v_c, u_r, v_r, u_s, v_s = _kernels(xi, eta, l, self_mask)

    # Panel j's linear vorticity = gamma_j * (ramp down) + gamma_{j+1} * ramp.
    ua_l, va_l = u_c - u_r, v_c - v_r
    ub_l, vb_l = u_r, v_r

    ua, va = _to_global(ua_l, va_l, pan)
    ub, vb = _to_global(ub_l, vb_l, pan)
    us, vs = _to_global(u_s, v_s, pan)

    nx = pan.nx[:, None]
    ny = pan.ny[:, None]
    tx = pan.tx[:, None]
    ty = pan.ty[:, None]

    an_a = ua * nx + va * ny
    an_b = ub * nx + vb * ny
    bn = us * nx + vs * ny
    at_a = ua * tx + va * ty
    at_b = ub * tx + vb * ty
    bt = us * tx + vs * ty

    # Transpiration boundary condition: the outer inviscid flow must LEAVE
    # the surface at the blowing rate, (V . n_out) = sigma, not stay
    # tangent — otherwise the vortex adjustment cancels the very outflow
    # the sources model and the displacement effect on circulation is lost.
    # In inward-normal terms the prescribed normal velocity is -sigma, so
    # the identity joins the source self/induced influence in the RHS map.
    bn = bn + jnp.eye(n, dtype=bn.dtype)

    an = _gamma_columns(an_a, an_b)
    a_full = jnp.zeros((n + 1, n + 1), an.dtype)
    a_full = a_full.at[:n, :].set(an)
    # Kutta: gamma at the two trailing-edge nodes cancel.
    a_full = a_full.at[n, 0].set(1.0)
    a_full = a_full.at[n, n].set(1.0)

    lu, piv = jax.scipy.linalg.lu_factor(a_full)

    # Edge-velocity sensitivity to transpiration sources:
    #   gamma(sigma) = A^-1 [b0 - Bn sigma]   (sigma enters the RHS)
    #   Vt(sigma)    = Vt0 + (At A^-1 (-Bn) + Bt) sigma
    rhs = jnp.concatenate([-bn, jnp.zeros((1, n), bn.dtype)], axis=0)
    ginf = _refined_solve(a_full, lu, piv, rhs)       # (N+1, N)
    at_full = _gamma_columns(at_a, at_b)              # (N, N+1)
    due_dsigma = at_full @ ginf + bt

    return InviscidOperator(pan, a_full, lu, piv, bn, at_a, at_b, bt,
                            due_dsigma, ginf)


def _freestream(alpha_deg):
    a = jnp.deg2rad(alpha_deg)
    return jnp.cos(a), jnp.sin(a)


@partial(jax.jit, static_argnames=())
def solve_inviscid(
    op: InviscidOperator,
    alpha_deg: jnp.ndarray,
    sigma: jnp.ndarray | None = None,
) -> InviscidSolution:
    """Solve for the surface vorticity and integrate Cp -> CL/Cm.

    ``sigma`` (optional, (N,)) are known transpiration source strengths from
    the boundary layer; ``None`` is the pure inviscid path (the reference's
    Strategy-3 fallback, main.py:315-323).
    """
    pan = op.pan
    n = pan.xm.shape[0]
    uinf, vinf = _freestream(alpha_deg)

    rhs_n = -(uinf * pan.nx + vinf * pan.ny)
    if sigma is not None:
        rhs_n = rhs_n - op.bn @ sigma
    rhs = jnp.concatenate([rhs_n, jnp.zeros((1,), rhs_n.dtype)])

    gamma = _refined_solve(op.a_full, op.lu, op.piv, rhs)

    vt = uinf * pan.tx + vinf * pan.ty
    vt = vt + _gamma_columns(op.at_a, op.at_b) @ gamma
    if sigma is not None:
        vt = vt + op.bt @ sigma

    cp = 1.0 - vt * vt

    # Force/moment from Cp over the surface: dF = -Cp * n_out * ds with
    # n_out = -n_in, i.e. dF = Cp * n_in * ds.
    ds = pan.length
    fx = jnp.sum(cp * pan.nx * ds)
    fy = jnp.sum(cp * pan.ny * ds)
    ca, sa = _freestream(alpha_deg)
    cl = fy * ca - fx * sa
    cd = fx * ca + fy * sa
    # Pitching moment about quarter chord, positive nose-up (aero convention:
    # the CCW z-moment of dF = Cp * n_in * ds pitches the nose DOWN, so flip).
    xref, yref = 0.25, 0.0
    cm = -jnp.sum(
        cp * ds * ((pan.xm - xref) * pan.ny - (pan.ym - yref) * pan.nx)
    )

    gam_avg = 0.5 * (gamma[:-1] + gamma[1:])
    circulation = jnp.sum(gam_avg * ds)

    return InviscidSolution(gamma, vt, cp, cl, cm, cd, circulation)


def velocity_at_points(
    px: jnp.ndarray,
    py: jnp.ndarray,
    op: InviscidOperator,
    gamma: jnp.ndarray,
    alpha_deg: jnp.ndarray,
    sigma: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Off-body velocity field at arbitrary points (flow-field backend).

    Replaces the reference frontend's per-panel accumulation loop
    (Airfoil_Analysis.py:148-164) with one batched influence evaluation.
    """
    pan = op.pan
    xi, eta, l = _local_frame(px, py, pan)
    u_c, v_c, u_r, v_r, u_s, v_s = _kernels(xi, eta, l)
    ua, va = _to_global(u_c - u_r, v_c - v_r, pan)
    ub, vb = _to_global(u_r, v_r, pan)
    us, vs = _to_global(u_s, v_s, pan)

    uinf, vinf = _freestream(alpha_deg)
    ga = gamma[:-1][None, :]
    gb = gamma[1:][None, :]
    u = uinf + jnp.sum(ua * ga + ub * gb, axis=1)
    v = vinf + jnp.sum(va * ga + vb * gb, axis=1)
    if sigma is not None:
        u = u + us @ sigma
        v = v + vs @ sigma
    return u, v
