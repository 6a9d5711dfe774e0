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
    r2sq = (xi - l) ** 2 + eta * eta + 1e-20
    # delta = theta1 - theta2 and logr = log(r1/r2) evaluated WITHOUT the
    # catastrophic far-field cancellation of the naive two-arctan2 /
    # log-ratio forms (at r >> l both differences are ~l/r while each term
    # is O(1); in f32 the noise floor then scales with r and the summed
    # off-body field stops decaying). The fused forms below compute the
    # small differences directly:
    #   theta1 - theta2 = -atan2(eta*l, xi*(xi-l) + eta^2)
    #   log(r1/r2)      = 0.5*log1p(l*(2*xi - l) / r2^2)
    # (the atan2 identity holds on the full exterior because the subtended
    # angle of a segment is within (-pi, pi); on-panel limits are +-pi and
    # handled by self_mask).
    delta = -jnp.arctan2(eta * l, xi * (xi - l) + eta * eta)
    logr = 0.5 * jnp.log1p(l * (2.0 * xi - l) / r2sq)
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


def _te_maps(px, py, pan: Paneling):
    """TE gap-panel velocity influence per unit (gamma[0] - gamma[N]).

    A blunt trailing edge leaves the contour open; with nothing spanning
    the gap the discrete vortex system resolves the base flow with a huge
    local gamma spike on the two sliver TE panels (measured: gamma[0]
    -3.46 vs -0.79 on NACA 2412 with the standard 0.252% open TE), which
    corrupts near-TE edge velocities and the first wake samples. XFOIL
    closes the gap with a single panel carrying uniform source and vortex
    strengths tied to the local sheet strength (Drela 1989; the reference
    inherits this behaviour through the XFOIL binary it shells to,
    main.py:328-519): the wake sheet of strength (gamma_upper -
    gamma_lower)/2 crosses the gap panel at an angle, its normal-crossing
    component acting as a source sheet and its tangential component as a
    vortex sheet on the panel:

        sigma_te = -0.5 * (g0 - gN) * |s x t|
        gamma_te = -0.5 * (g0 - gN) * |s . t|

    with ``s`` the unit vector across the gap (lower TE node -> upper TE
    node) and ``t`` the downstream TE bisector. The overall sign follows
    this solver's gamma convention (opposite XFOIL's: at positive lift
    gamma < 0 on the upper surface) and is pinned by the nodal-strength
    smoothness it produces — with it, the open-TE NACA 2412 solve gives
    gamma[0:3] = (-0.744, -0.779, -0.814), smoothly continuing the
    interior, where the opposite sign leaves a +1.31/-0.52 sawtooth at
    the TE (and no TE panel at all gives a -3.46 spike). Both strengths
    are linear in the nodal unknowns, so the influence folds into columns
    0 and N of the vortex system. Returns global-frame (u, v), each (P,),
    per unit (gamma[0] - gamma[N]); for a closed TE the panel length
    vanishes and the maps go smoothly to zero.
    """
    x_u, y_u = pan.xp[0], pan.yp[0]
    x_l, y_l = pan.xp[-1], pan.yp[-1]
    dx, dy = x_u - x_l, y_u - y_l
    gap = jnp.hypot(dx, dy)
    inv = 1.0 / jnp.maximum(gap, 1e-12)
    sx, sy = dx * inv, dy * inv
    # Downstream TE bisector: panel 0 runs TE->LE on the upper surface
    # (reverse it), panel N-1 runs LE->TE on the lower surface.
    bx = 0.5 * (-pan.tx[0] + pan.tx[-1])
    by = 0.5 * (-pan.ty[0] + pan.ty[-1])
    bn = jnp.maximum(jnp.hypot(bx, by), 1e-12)
    bx, by = bx / bn, by / bn
    scs = jnp.abs(sx * by - sy * bx)
    sds = jnp.abs(sx * bx + sy * by)

    # Panel-local frame along s, origin at the lower TE node.
    dxp = px - x_l
    dyp = py - y_l
    xi = dxp * sx + dyp * sy
    eta = -dxp * sy + dyp * sx
    l = gap
    r2sq = (xi - l) ** 2 + eta * eta + 1e-20
    delta = -jnp.arctan2(eta * l, xi * (xi - l) + eta * eta)
    logr = 0.5 * jnp.log1p(l * (2.0 * xi - l) / r2sq)
    u_c = delta / _TWO_PI
    v_c = logr / _TWO_PI
    u_s = logr / _TWO_PI
    v_s = -delta / _TWO_PI

    sig = -0.5 * scs
    gam = -0.5 * sds
    u_loc = gam * u_c + sig * u_s
    v_loc = gam * v_c + sig * v_s
    return u_loc * sx - v_loc * sy, u_loc * sy + v_loc * sx


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
    ``at_full``: (N, N+1) nodal-vortex -> midpoint-tangential map with the
    TE gap-panel columns folded in (use this, not ``_gamma_columns(at_a,
    at_b)``, wherever gamma maps to a surface velocity).
    ``rhs_scale``: (N,) per-row scaling for externally-assembled
    normal-velocity RHS vectors (the sharp-TE regularisation blends the
    last tangency row away; its RHS must shrink identically).
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
    at_full: jnp.ndarray
    rhs_scale: jnp.ndarray


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

    # TE gap panel (blunt TE): columns 0 and N pick up its influence per
    # unit (gamma[0] - gamma[N]); see _te_maps.
    u_te, v_te = _te_maps(pan.xm, pan.ym, pan)
    an_te = u_te * pan.nx + v_te * pan.ny
    at_te = u_te * pan.tx + v_te * pan.ty

    an = _gamma_columns(an_a, an_b)
    an = an.at[:, 0].add(an_te).at[:, n].add(-an_te)

    # Sharp-TE regularisation. When the TE gap closes, the two sliver TE
    # panels become collinear and their tangency rows nearly identical —
    # the system is then singular up to rounding (measured: nodal gamma at
    # the TE of a cusped Joukowski swings between -13 and -5883 purely
    # with the XLA fusion layout, and the Kutta cancellation eventually
    # leaks into CL). XFOIL hits the same singularity and replaces one TE
    # equation with a curvature extrapolation of gamma into the TE (Drela
    # 1989); here BOTH sliver tangency rows are blended toward one-sided
    # gamma curvature extrapolations into the TE,
    #     g0 - 2 g1 + g2 = 0        (row 0, upper sliver)
    #     gN - 2 gN-1 + gN-2 = 0    (row N-1, lower sliver)
    # Replacing only ONE row keeps the system regular but the surviving
    # sliver tangency equation forces a large antisymmetric nodal-gamma
    # spike at the cusp (measured +-18 vs ~1 interior on the cusped
    # Joukowski, f64-confirmed — a property of the equations, not of
    # rounding) and breaks up/down mirror symmetry (CL = -0.0053 on the
    # symmetric case at alpha = 0). Tangency at the two ~1e-4 c sliver
    # midpoints is abandoned at full sharpness — leakage through panels
    # that small is negligible — and the extrapolations pin a smooth
    # nodal gamma through the TE. A smooth sharpness weight keeps the
    # operator jit-traceable across geometries: fully on below a 1e-4 c
    # gap, off above 1e-3 c.
    gap = jnp.hypot(pan.xp[0] - pan.xp[-1], pan.yp[0] - pan.yp[-1])
    t = jnp.clip((gap - 1e-4) / 9e-4, 0.0, 1.0)
    w_sharp = 1.0 - t * t * (3.0 - 2.0 * t)
    ex_u = jnp.zeros((n + 1,), an.dtype)
    ex_u = ex_u.at[0].set(1.0).at[1].set(-2.0).at[2].set(1.0)
    ex_l = jnp.zeros((n + 1,), an.dtype)
    ex_l = ex_l.at[n].set(1.0).at[n - 1].set(-2.0).at[n - 2].set(1.0)
    an = an.at[0, :].multiply(1.0 - w_sharp)
    an = an.at[0, :].add(w_sharp * ex_u)
    an = an.at[n - 1, :].multiply(1.0 - w_sharp)
    an = an.at[n - 1, :].add(w_sharp * ex_l)
    # The sacrificed rows' RHS terms must scale identically. ``bn`` (the
    # only RHS map built here) is scaled at source; external RHS builders
    # (freestream tangency in solve_inviscid, wake-source rows in
    # wake.build_wake_operator) apply ``rhs_scale``.
    rhs_scale = (jnp.ones((n,), an.dtype)
                 .at[0].set(1.0 - w_sharp)
                 .at[n - 1].set(1.0 - w_sharp))
    bn = bn * rhs_scale[:, None]

    a_full = jnp.zeros((n + 1, n + 1), an.dtype)
    a_full = a_full.at[:n, :].set(an)
    # Kutta: gamma at the two trailing-edge nodes cancel.
    a_full = a_full.at[n, 0].set(1.0)
    a_full = a_full.at[n, n].set(1.0)

    lu, piv = jax.scipy.linalg.lu_factor(a_full)

    at_full = _gamma_columns(at_a, at_b)              # (N, N+1)
    at_full = at_full.at[:, 0].add(at_te).at[:, n].add(-at_te)

    # Edge-velocity sensitivity to transpiration sources:
    #   gamma(sigma) = A^-1 [b0 - Bn sigma]   (sigma enters the RHS)
    #   Vt(sigma)    = Vt0 + (At A^-1 (-Bn) + Bt) sigma
    rhs = jnp.concatenate([-bn, jnp.zeros((1, n), bn.dtype)], axis=0)
    ginf = _refined_solve(a_full, lu, piv, rhs)       # (N+1, N)
    due_dsigma = at_full @ ginf + bt

    return InviscidOperator(pan, a_full, lu, piv, bn, at_a, at_b, bt,
                            due_dsigma, ginf, at_full, rhs_scale)


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

    rhs_n = op.rhs_scale * -(uinf * pan.nx + vinf * pan.ny)
    if sigma is not None:
        rhs_n = rhs_n - op.bn @ sigma
    rhs = jnp.concatenate([rhs_n, jnp.zeros((1,), rhs_n.dtype)])

    gamma = _refined_solve(op.a_full, op.lu, op.piv, rhs)

    vt = uinf * pan.tx + vinf * pan.ty
    vt = vt + op.at_full @ gamma
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
    u_te, v_te = _te_maps(px, py, pan)
    g_te = gamma[0] - gamma[-1]
    u = u + u_te * g_te
    v = v + v_te * g_te
    if sigma is not None:
        u = u + us @ sigma
        v = v + vs @ sigma
    return u, v
