"""Simultaneous Newton viscous-inviscid coupling.

This is the TPU-native equivalent of the XFOIL binary's VISCAL Newton
solve that the reference drives through a subprocess (reference
main.py:362-364 ``VISC``/``ITER 500`` script lines): the integral
boundary-layer equations on both surfaces and the wake are solved
*simultaneously* with the edge-velocity interaction law as one nonlinear
system, instead of the direct under-relaxed fixed-point iteration in
``coupled.solve_viscous``. The direct iteration stalls in a limit cycle
with the boundary layer ~25% too thick at the trailing edge (the Goldstein
singularity makes direct marching only neutrally stable); the simultaneous
system has no such limitation and is how XFOIL achieves its accuracy.

TPU-first structure: the residual is *elementwise over stations* (no
sequential march), so one Newton iteration = one vectorised residual, one
forward-mode Jacobian (a vmapped batch of JVPs), and one dense
(3N x 3N) linear solve on the MXU. A whole viscous solve is a few dozen
such iterations, fully vmap-able over (alpha, Re).

Unknowns per station i (upper M + lower M + wake W stations):

    z_i = (ln theta_i,  ln m_i,  ln ctau_i)

with ``m = Ue * dstar`` the mass defect. The station edge velocity is the
*interaction law*  Ue = Ue_inv + d(Ue)/d(sigma) . sigma(m)  (linear in m
through the precomputed panel influence operators), which is what removes
the separation singularity.

Transition IS an unknown of the simultaneous system: each surface
station carries the e^N envelope amplification factor n as a fourth
variable, and the closure blend weight at every station is a smooth
sigmoid of (n - n_crit) — XFOIL's own structure (its BL system solves
the amplification equation simultaneously, re-locating transition inside
every Newton iteration; xbl.f shares the cτ slot with n~). Two earlier
designs were measured and rejected:

* outer front↔field leapfrog rounds (march authority, the round-2
  design): the march is unique GIVEN an edge-velocity field, but the
  coupled (front, field) pair still has multiple fixed points — the same
  alpha solved to xtr 0.31 or 0.46 on 0012@1e6@4 depending on which
  donor chain it rode in on, and the frozen-front rounds capped how far
  the front could travel from a biased warm start;
* a per-round explicit e^N over the iterate's own fields: chicken-and-egg
  (a wrongly-laminar aft state reads rate ~ 0 and never crosses) because
  the re-location had no derivative coupling into the Newton step.

With n in the system the Newton step moves (theta, m, n) TOGETHER with
full cross-derivatives: a laminar separated shear layer's rising theta
and Hk feed the amplification rate inside the same linearisation, which
is what places short-bubble transition without any external authority.
The blend weight is local to its station (w_i = f(n_i, x_i)), so the
Jacobian keeps the exact banded structure the colored seed plan exploits.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from airfoil_tpu.inviscid.panel_solver import (
    InviscidOperator,
    solve_inviscid,
)
from airfoil_tpu.viscous import closures as cl
from airfoil_tpu.viscous.coupled import (
    SideBL,
    ViscousResult,
    _find_stagnation,
    _forces_from_cp,
    _side_stations,
    _sigma_from_sides,
    _sigma_nodal_from_sides,
    _sigma_wake_nodal,
    _smooth_clip_derivative,
)
from airfoil_tpu.viscous.march import march_side
from airfoil_tpu.viscous.wake import (
    WakeOperator,
    blend_te_continuity,
    build_wake_operator,
)

__all__ = ["solve_viscous_newton"]

_AVG_W = 0.65          # implicit interval weighting (0.5 = trapezoid)
_KLAG = 5.6
_TR_WIDTH = 0.012      # chordwise half-width of the forced-trip ramp
_W_N = 0.20            # n-width of the free-transition blend sigmoid:
#                        w = sigmoid((n - n_crit)/_W_N). Sharp enough that
#                        slow-growth crossings (dn/dx ~ 10: 0012-class
#                        mild recoveries) lock in within ~0.05c — a fatter
#                        blend (0.4 tried) smeared those transitions over
#                        ~0.15c and let the solve settle knife-edge
#                        states 0.1c apart between compilation contexts.
_N_VARS = 4            # (ln theta, ln m, ln ctau, n) per station
# LM budget knobs (module-level so calibration probes can patch them):
# _RMS_OK is the final convergence-verdict bound; _RMS_SETTLED the
# keep-polishing gate (the round loop only stops early below it);
# _FUTILITY stops a point whose round made less than (1 - _FUTILITY)
# relative progress. The two rms bounds are deliberately an order apart:
# near stall the thin/thick pseudo-root valley floors at rms ~0.005-0.009
# while the honest root sits at ~0.001-0.003 — a single 0.035 gate let
# the loop exit the moment it entered the valley, freezing a wrong-CD
# state that still passed the final verdict.
_RMS_OK = 0.035
_RMS_SETTLED = 0.0035
_FUTILITY = 0.92
# CD-ceiling wrong-basin guard coefficients (see the cd_hi comment in
# _solve_viscous_newton_impl); module-level so A/B probes can patch them
# before the first trace.
_CD_HI_COEF = 0.25
_CD_HI_SEP = 0.30
# ── round-4 mechanism gates (trace-time; module-level for A/B probes) ──
# Each flag isolates one round-4 physics mechanism so the parity harness
# can bisect regressions mechanism-by-mechanism. False = the round-3
# semantics for that mechanism. ALL DEFAULT OFF: a full product-path
# parity A/B on TPU (2026-08-20, vendored truth, 16 anchors) measured
# every round-4 mechanism group as a net attached-range regression —
#   all-on (round-4 HEAD):   median |CL| 4.0% / |CD| 28.0%, 11/16 conv
#   verdict gates only:      median |CL| 1.6% / |CD| 15.9%, 10/16 conv
#     (front gate / per-side ratio veto the honest bubble-regime
#      0012@8/10 states; the Hk>2.9 sep diagnostic loosens cd_hi enough
#      to serve 2412@2e5 alpha=0 at CD +80%)
#   all-off (round-3):       median |CL| 2.9% / |CD| 10.7%, 11/16 conv
# The round-4 reseed/budget group (reseed + settled exit + 5 rounds +
# donor ceiling + free-front seeds) additionally pushed 0012@4 CD from
# +10.7% to +40.4%. Kept as gates (not deleted) for targeted stall-
# campaign probes; any flag that never earns product-path evidence gets
# removed rather than shipped dormant.
_ORACLE_RESEED = False   # in-loop drift probe + march reseed in fp_round
_SETTLED_EXIT = False    # round loop polishes to _RMS_SETTLED (False: _RMS_OK)
_PER_SIDE_RATIO = False  # pinned per-side theta-ratio gates (False: summed
#                          ratio over free-amplification march lanes)
_FRONT_GATE = False      # free-march front-consistency veto
_SEED_FREE_FRONT = False  # continuation seeds carry min(system front,
#                          free-march front) (False: system front)
_SEP_DIAG_29 = False     # diagnostic separation onset Hk > 2.9 + cap 0.50
#                          (False: march Hk caps + cap 0.40)
_DONOR_CEIL = False      # continuation donor-front trip ceiling
_CONT_ROUNDS = 3         # continuation LM restart-round cap (round-3: 3)


def _avg(f1, f2):
    return (1.0 - _AVG_W) * f1 + _AVG_W * f2


def _interval_weight(hk_m, dlnue_dxi):
    """Implicit interval weight per interval.

    Inputs: interval-mean Hk and the imposed log-edge-velocity gradient
    d(ln ue)/d(xi) (negative in recoveries). Constant by default (XLA
    folds it). Kept as a seam: an XFOIL-xbl.f style Hk-gated upwind ramp
    (0.65 -> 1.0 over Hk 3..4.5) was measured through the product path
    and REJECTED — no stall-tail benefit, attached-flow CD damage (see
    STATUS.md round-3 notes). An Hk gate also cannot kill the thin
    spurious root it targets: at that root the solution's own Hk stays
    attached-small, so the gate never fires — hence the gradient input,
    which rides the imposed field instead of the solution. Experiments
    patch this function rather than re-threading the residuals."""
    return jnp.full_like(hk_m, _AVG_W)


def _station_closures(theta, dstar, ue, nu, ctau, w, wake_mask):
    """Blended closure set at every station (elementwise).

    ``w``: (N,) turbulence weight in [0, 1]. ``wake_mask``: (N,) 1 where the
    station is in the wake (no wall: Cf = 0, shear dissipation only).
    """
    theta = jnp.maximum(theta, 1e-10)
    hk = jnp.clip(dstar / theta, 1.005, 12.0)
    ret = jnp.maximum(ue * theta / nu, 1.0)

    # The laminar correlations are only valid up to the separated-shear
    # value HK_LAM_MAX; past it they extrapolate wildly and a station in
    # the transition ramp (where the laminar weight is still ~0.5 but the
    # iterate's Hk can spike to 10+) turns into a nonphysical delta* blob
    # that locks in. Saturate the laminar branch there — the march's
    # laminar step applies the same cap (march.py Hk cap). The turbulent
    # branch keeps the full range: separated-TE decambering lives at
    # Hk 4-12 and must stay representable.
    hk_l = jnp.minimum(hk, cl.HK_LAM_MAX)
    hs_l = cl.lam_hstar(hk_l)
    hs_t = cl.turb_hstar(hk, ret)
    hs = (1.0 - w) * hs_l + w * hs_t

    cf_l = cl.lam_cf(hk_l, ret)
    cf_t = cl.turb_cf(hk, ret)
    cf = (1.0 - w) * cf_l + w * cf_t

    cd_l = cl.lam_diss(hk_l, ret, hs_l)
    cd_t = cl.turb_diss(hk, ret, ctau, hs_t)
    cd = (1.0 - w) * cd_l + w * cd_t

    us = cl.turb_us(hk, hs_t)
    cd_wake = jnp.clip(ctau, 0.0, 0.3) * (1.0 - us)

    cf = jnp.where(wake_mask > 0, 0.0, cf)
    cd = jnp.where(wake_mask > 0, cd_wake, cd)
    return hk, ret, hs, cf, cd


class _Grid(NamedTuple):
    """Frozen station geometry for the Newton solve (upper+lower+wake)."""

    xi_u: jnp.ndarray
    xi_l: jnp.ndarray
    xi_w: jnp.ndarray
    x_u: jnp.ndarray
    y_u: jnp.ndarray
    x_l: jnp.ndarray
    y_l: jnp.ndarray
    s_q_u: jnp.ndarray     # arc positions of upper stations on the loop
    s_q_l: jnp.ndarray
    s0: jnp.ndarray        # frozen stagnation arc position
    te_gap: jnp.ndarray
    # Trip coordinates: chordwise x masked to -1 before the LE. The strip
    # wraps around the LE (stagnation sits on the opposite surface at
    # nonzero alpha), so a bare sigmoid((x - x_trip)/w) forced-trip ramp
    # fires AT STAGNATION whenever x_stag > x_trip — these masked arrays
    # are what every trip comparison must use (march.py applies the same
    # mask internally).
    xt_u: jnp.ndarray
    xt_l: jnp.ndarray


def _n_sat_gate(n, n_crit):
    """Soft saturation gate for the amplification ODE: ~1 through the
    n_crit crossing (full laminar growth rate, steep well-conditioned
    crossing), -> 0 as n approaches the n_crit + 3 state clip, so
    post-transition n parks at ~n_crit + 2.5 — high enough that the
    blend weight saturates at exactly 1, low enough that Newton can pull
    the front back when the profile relaxes."""
    return jax.nn.sigmoid((n_crit + 2.5 - n) / 0.4)


def _interval_residuals(s, ue, z, nu, w, wake: bool, n_crit=9.0):
    """Vectorised residuals for all intervals of one strip (M-1, 4).

    ``z``: (M, 4) = (ln theta, ln m, ln ctau, n) at each station.
    ``w``: (M,) turbulence blend weights — a smooth function of the n
    column (computed by the caller; ones in the wake).
    Returns per-interval residuals (momentum, kinetic energy, shear lag,
    amplification).
    """
    theta = jnp.exp(z[:, 0])
    m = jnp.exp(z[:, 1])
    ctau = jnp.exp(jnp.clip(z[:, 2], -20.0, 0.0))
    dstar = m / jnp.maximum(ue, 0.02)

    wake_mask = jnp.ones_like(theta) if wake else jnp.zeros_like(theta)

    hk, ret, hs, cf, cd = _station_closures(
        theta, dstar, ue, nu, ctau, w, wake_mask)

    ds = jnp.maximum(s[1:] - s[:-1], 1e-8)
    due = ue[1:] - ue[:-1]
    uw = _interval_weight(
        0.5 * (hk[:-1] + hk[1:]),
        due / (jnp.maximum(_avg(ue[:-1], ue[1:]), 1e-3) * ds))

    def iv(f):
        return (1.0 - uw) * f[:-1] + uw * f[1:]

    ue_m = iv(ue)
    t_m = iv(theta)
    h_m = iv(hk)
    hs_m = iv(hs)
    cf_m = iv(cf)
    cd_m = iv(cd)

    # 1) von Karman momentum integral.
    r1 = ((theta[1:] - theta[:-1]) / ds
          + (2.0 + h_m) * (t_m / ue_m) * (due / ds) - 0.5 * cf_m)
    # 2) kinetic-energy shape-parameter equation.
    r2 = (t_m * (hs[1:] - hs[:-1]) / ds
          + hs_m * (1.0 - h_m) * (t_m / ue_m) * (due / ds)
          - (2.0 * cd_m - hs_m * 0.5 * cf_m))

    # 3) shear-stress transport: the lag ODE downstream of transition,
    # blending into a relaxation toward the equilibrium of the RESET
    # (attached turbulent, Hk ~ 1.5) profile upstream — not of the local
    # laminar profile, whose high Hk would seed transition with a
    # ~5x-too-large ctau (march.py applies the same classical reset).
    # Rates are clamped: the physical lag scale 1/(2 delta) is stiff
    # enough to swamp the linearisation otherwise.
    hs_t = cl.turb_hstar(hk, ret)
    cteq = cl.turb_cteq(hk, ret, hs_t)
    delta = cl.delta_thickness(theta, dstar, hk)
    lag = _KLAG * (jnp.sqrt(cteq) - jnp.sqrt(ctau)) / (2.0 * delta)
    lag = jnp.clip(lag, -40.0, 40.0)
    hk_eq = jnp.clip(hk, 1.005, 1.55)
    hs_eq = cl.turb_hstar(hk_eq, ret)
    cteq_eq = cl.turb_cteq(hk_eq, ret, hs_eq)
    a_eq = jnp.log(jnp.clip(0.7 * cteq_eq, 1e-8, 0.3))
    relax = jnp.clip(8.0 * (a_eq - z[:, 2]), -40.0, 40.0)
    w2 = w[1:]
    rate3 = w2 * iv(lag) + (1.0 - w2) * relax[1:]
    r3 = (z[1:, 2] - z[:-1, 2]) / ds - rate3

    # 4) e^N envelope amplification: dn/ds = rate(Hk, theta, Re_theta)
    # over the SYSTEM's own profile, saturating softly at n ~ n_crit+2.5
    # (``_n_sat_gate``). The rate is NOT masked by the turbulence weight:
    # a (1-w) mask throttles growth exactly at the crossing (half-rate at
    # n = n_crit), which (a) makes every crossing shallow — the front
    # grazes n_crit tangentially and f32 noise moves it O(0.1c) (measured
    # 0.677 vs 0.804 lower-side crossings for the SAME 0012@1e6 alpha=0
    # point under different compilations), and (b) freezes post-crossing
    # stations at n ~ n_crit+0.4 where the blend weight saturates at only
    # ~0.90 — every "turbulent" station then carries a permanent ~10%
    # laminar closure blend (low Cf, wrong dissipation) for the rest of
    # the chord. With the saturation gate instead, n runs to ~n_crit+2.5
    # (w -> 1.0 exactly), the crossing keeps its full laminar slope, and
    # genuinely turbulent stations self-silence anyway: at their Hk ~ 1.5
    # (clipped to 2.1) the critical Re_theta is ~1.7e4, far above the
    # operating range, so the gated rate is already zero.
    # In a laminar separated shear layer the system Hk runs to
    # 8-12 with theta rising fast — the rate rides both, which is what
    # places short-bubble transition (a march with its Hk pinned at
    # HK_LAM_MAX understates the bubble's growth by ~0.1c at Re 1e6).
    # In the wake n is inert: pinned to a constant by r4 = dn.
    if wake:
        r4 = z[1:, 3] - z[:-1, 3]
    else:
        rate_n = cl.amplification_rate(hk, theta, ret)
        gain = iv(rate_n * _n_sat_gate(z[:, 3], n_crit)) * ds
        # Normalised so a high-rate interval (gain >> 1) cannot swamp the
        # least-squares objective: the residual measures the RELATIVE
        # misfit of the n-step there, and the absolute misfit elsewhere.
        # The 3x weight keeps the slow-growth n-rows from hiding inside
        # the global rms budget: a systematic per-interval n drift of
        # ~0.04 moves the crossing by ~0.2c while costing the unweighted
        # rms only ~0.013 (measured as a 0.23c upper/lower transition
        # asymmetry on the symmetric 0012 at alpha = 0).
        r4 = 3.0 * (z[1:, 3] - z[:-1, 3] - gain) / (1.0 + gain)

    # Scale to O(1): thickness equations by ds/theta, the lag ODE by ds.
    sc = ds / jnp.maximum(t_m, 1e-10)
    return jnp.stack([r1 * sc, r2 * sc, r3 * ds, r4], axis=1)


def _pack(zu, zl, zw):
    return jnp.concatenate([zu.ravel(), zl.ravel(), zw.ravel()])


def _unpack(zz, m_s, n_w):
    v = _N_VARS
    zu = zz[: v * m_s].reshape(m_s, v)
    zl = zz[v * m_s: 2 * v * m_s].reshape(m_s, v)
    zw = zz[2 * v * m_s:].reshape(n_w, v)
    return zu, zl, zw


def _w_station(n, x, n_crit, x_trip):
    """Per-station turbulence blend weight: smooth OR of the free
    (amplification) transition sigmoid and the forced-trip chordwise ramp.
    Local to its station — the Jacobian stays banded.

    The amplification sigmoid is ASYMMETRIC: sharp below n_crit, smooth
    above. A symmetric width lets stations at n ~ 8.5 already run ~15%
    turbulent, which thins the layer, raises upstream Hk and accelerates
    the amplification — a systematic bias toward early-transition
    self-consistent states (measured ~0.05-0.1c early on the 0012@1e6
    sweep). Below-critical stations must stay essentially laminar; the
    smooth upper tail keeps Newton's runway."""
    dn = jnp.clip(n, -5.0, 30.0) - n_crit
    wn = jnp.where(dn < 0.0, 0.25 * _W_N, _W_N)
    wa = jax.nn.sigmoid(dn / wn)
    wt = jax.nn.sigmoid((x - x_trip) / _TR_WIDTH)
    return wa + wt - wa * wt


def _soft_floor(x, lo, beta=60.0):
    """Smooth max(x, lo): keeps d/dx > 0 everywhere so Newton can push a
    pinned edge velocity back off the floor (a hard max zeroes the Jacobian
    column and strands the iteration)."""
    return lo + jax.nn.softplus(beta * (x - lo)) / beta


_UE_FLOOR_BODY = 0.02
_UE_FLOOR_WAKE = 0.05


def _ue_raws_from_m(op, wop, grid, vt0, m_u, m_l, m_w):
    """Pre-floor station edge velocities — LINEAR in the mass defects
    (modulo the rarely-active source clip), which is what makes the
    structured-Jacobian factorisation exact. Sources use the sharp
    panel-consistent nodal discretisation (see coupled.py): the Newton
    system is implicit and needs no smoothing for stability."""
    pan = op.pan
    sigma_b = _sigma_nodal_from_sides(
        pan, grid.s0, grid.xi_u, m_u, grid.xi_l, m_l)
    m_te = m_u[-1] + m_l[-1] + grid.te_gap
    sigma_w = _sigma_wake_nodal(wop.wpan, wop.xi, m_w, m_te)
    vt = vt0 + op.due_dsigma @ sigma_b + wop.dvt_dsigw @ sigma_w
    s_mid = 0.5 * (pan.s[:-1] + pan.s[1:])
    s_in = s_mid[1:-1]
    vt_in = vt[1:-1]
    raw_u = -jnp.interp(grid.s_q_u, s_in, vt_in)
    raw_l = jnp.interp(grid.s_q_l, s_in, vt_in)
    raw_w = wop.uw0 + wop.wb @ sigma_b + wop.ww @ sigma_w
    # Wake edge velocity made continuous with the TE boundary-layer edge
    # velocity (see wake.blend_te_continuity) — linear, so the structured
    # Jacobian's interaction operator stays exact.
    raw_w = blend_te_continuity(wop.xi, raw_w,
                                0.5 * (raw_u[-1] + raw_l[-1]))
    return raw_u, raw_l, raw_w, vt, sigma_b, sigma_w


def _ue_from_m(op, wop, grid, vt0, m_u, m_l, m_w):
    """Interaction law: station edge velocities as a function of the mass
    defects (linear through the precomputed influence operators)."""
    raw_u, raw_l, raw_w, vt, sigma_b, sigma_w = _ue_raws_from_m(
        op, wop, grid, vt0, m_u, m_l, m_w)
    ue_u = _soft_floor(raw_u, _UE_FLOOR_BODY)
    ue_l = _soft_floor(raw_l, _UE_FLOOR_BODY)
    ue_w = _soft_floor(raw_w, _UE_FLOOR_WAKE)
    return ue_u, ue_l, ue_w, vt, sigma_b, sigma_w


def _residual_given_ue(zz, ue_u, ue_l, ue_w, grid, nu, m_s, n_w,
                       n_crit, x_trip_u, x_trip_l):
    """System residual with the edge velocities as EXPLICIT arguments.

    Holding ue fixed, every residual row depends only on the one or two
    stations of its own strip (banded) — the split is what the colored
    structured Jacobian exploits. The turbulence blend weights are a
    smooth LOCAL function of each station's own n variable, so they do
    not widen the band.
    """
    zu, zl, zw = _unpack(zz, m_s, n_w)

    w_u = _w_station(zu[:, 3], grid.xt_u, n_crit, x_trip_u)
    w_l = _w_station(zl[:, 3], grid.xt_l, n_crit, x_trip_l)

    ones_w = jnp.ones_like(grid.xi_w)
    ru = _interval_residuals(grid.xi_u, ue_u, zu, nu, w_u, wake=False,
                             n_crit=n_crit)
    rl = _interval_residuals(grid.xi_l, ue_l, zl, nu, w_l, wake=False,
                             n_crit=n_crit)
    rw = _interval_residuals(grid.xi_w, ue_w, zw, nu, ones_w, wake=True)

    # Initial conditions: Falkner-Skan stagnation similarity at station 0
    # of each surface (Hiemenz theta, Hk = 2.24), the laminar ctau pin,
    # and zero accumulated amplification.
    def side_ic(z0, xi0, ue0):
        k = jnp.maximum(ue0 / jnp.maximum(xi0, 1e-8), 1e-6)
        ln_t0 = 0.5 * jnp.log(0.075 * nu / k)
        theta0 = jnp.exp(z0[0])
        hk0 = jnp.exp(z0[1]) / jnp.maximum(ue0, 0.02) / theta0
        ret0 = jnp.maximum(ue0 * theta0 / nu, 1.0)
        hk_eq = jnp.clip(hk0, 1.005, 1.55)
        hs0 = cl.turb_hstar(hk_eq, ret0)
        cteq0 = cl.turb_cteq(hk_eq, ret0, hs0)
        return jnp.stack([
            z0[0] - ln_t0,
            hk0 - 2.24,
            z0[2] - jnp.log(jnp.clip(0.7 * cteq0, 1e-8, 0.3)),
            z0[3],
        ])

    ric_u = side_ic(zu[0], grid.xi_u[0], ue_u[0])
    ric_l = side_ic(zl[0], grid.xi_l[0], ue_l[0])

    # Wake initial conditions: thicknesses merge at the trailing edge; the
    # shear coefficient carries over theta-weighted.
    t_te_u = jnp.exp(zu[-1, 0])
    t_te_l = jnp.exp(zl[-1, 0])
    d_te_u = jnp.exp(zu[-1, 1]) / ue_u[-1]
    d_te_l = jnp.exp(zl[-1, 1]) / ue_l[-1]
    ct_u = jnp.exp(jnp.clip(zu[-1, 2], -20.0, 0.0))
    ct_l = jnp.exp(jnp.clip(zl[-1, 2], -20.0, 0.0))
    t_w0 = jnp.exp(zw[0, 0])
    d_w0 = jnp.exp(zw[0, 1]) / ue_w[0]
    ct_mix = ((ct_u * t_te_u + ct_l * t_te_l)
              / jnp.maximum(t_te_u + t_te_l, 1e-10))
    ric_w = jnp.stack([
        (t_w0 - (t_te_u + t_te_l)) / jnp.maximum(t_te_u + t_te_l, 1e-10),
        (d_w0 - (d_te_u + d_te_l + grid.te_gap))
        / jnp.maximum(d_te_u + d_te_l + grid.te_gap, 1e-10),
        zw[0, 2] - jnp.log(jnp.clip(ct_mix, 1e-8, 0.3)),
        zw[0, 3],
    ])

    return jnp.concatenate([
        ric_u, ru.ravel(), ric_l, rl.ravel(), ric_w, rw.ravel()])


def _residual(zz, op, wop, grid, vt0, nu, m_s, n_w, n_crit,
              x_trip_u, x_trip_l):
    """Full system residual, (_N_VARS * (2 m_s + n_w),)."""
    zu, zl, zw = _unpack(zz, m_s, n_w)
    ue_u, ue_l, ue_w, _vt, _sb, _sw = _ue_from_m(
        op, wop, grid, vt0, jnp.exp(zu[:, 1]), jnp.exp(zl[:, 1]),
        jnp.exp(zw[:, 1]))
    return _residual_given_ue(zz, ue_u, ue_l, ue_w, grid, nu,
                              m_s, n_w, n_crit, x_trip_u, x_trip_l)


def _seed_plan(m_s: int, n_w: int):
    """Static coloring/scatter plan for the structured Jacobian.

    Coloring by (strip, station parity[, variable]) is collision-free:
    every residual row touches at most one station of each parity within
    its own strip, and the wake-IC rows touch one station of each strip.
    2*3*_N_VARS z-seeds + 6 ue-seeds replace _N_VARS*(2*m_s + n_w) dense
    jacfwd columns.
    """
    import numpy as np

    v = _N_VARS
    n3 = v * (2 * m_s + n_w)
    s_m = 2 * m_s + n_w

    def zcol(strip, st, var):
        return (0, v * m_s, 2 * v * m_s)[strip] + v * st + var

    def ucol(strip, st):
        return (0, m_s, 2 * m_s)[strip] + st

    def zseed(strip, st, var):
        return strip * 2 * v + (st % 2) * v + var

    def useed(strip, st):
        return strip * 2 + (st % 2)

    r_ru = v
    r_ic_l = r_ru + v * (m_s - 1)
    r_rl = r_ic_l + v
    r_ic_w = r_rl + v * (m_s - 1)
    r_rw = r_ic_w + v

    dep_z, dep_u = [], []
    for strip, base in ((0, 0), (1, r_ic_l)):          # side IC blocks
        for eq in range(v):
            row = base + eq
            for var in range(v):
                dep_z.append((row, strip, 0, var))
            dep_u.append((row, strip, 0))
    for strip, base, m in ((0, r_ru, m_s), (1, r_rl, m_s),
                           (2, r_rw, n_w)):            # interval blocks
        for i in range(1, m):
            for eq in range(v):
                row = base + v * (i - 1) + eq
                for st in (i - 1, i):
                    for var in range(v):
                        dep_z.append((row, strip, st, var))
                    dep_u.append((row, strip, st))
    for eq in range(v):                                # wake IC block
        row = r_ic_w + eq
        for strip, st in ((0, m_s - 1), (1, m_s - 1), (2, 0)):
            for var in range(v):
                dep_z.append((row, strip, st, var))
            dep_u.append((row, strip, st))

    rows_z = np.array([d[0] for d in dep_z], np.int32)
    cols_z = np.array([zcol(*d[1:]) for d in dep_z], np.int32)
    seeds_z = np.array([zseed(*d[1:]) for d in dep_z], np.int32)
    rows_u = np.array([d[0] for d in dep_u], np.int32)
    cols_u = np.array([ucol(*d[1:]) for d in dep_u], np.int32)
    seeds_u = np.array([useed(*d[1:]) for d in dep_u], np.int32)

    bz = np.zeros((n3, 6 * v), np.float32)
    for strip, m in ((0, m_s), (1, m_s), (2, n_w)):
        for st in range(m):
            for var in range(v):
                bz[zcol(strip, st, var), zseed(strip, st, var)] = 1.0
    bu = np.zeros((s_m, 6), np.float32)
    for strip, m in ((0, m_s), (1, m_s), (2, n_w)):
        for st in range(m):
            bu[ucol(strip, st), useed(strip, st)] = 1.0

    # Column index (z-space) of each station's ln-m variable, in m-vector
    # order — the chain-rule scatter for d ue / d z.
    var1_cols = np.array(
        [zcol(0, st, 1) for st in range(m_s)]
        + [zcol(1, st, 1) for st in range(m_s)]
        + [zcol(2, st, 1) for st in range(n_w)], np.int32)

    return dict(rows_z=rows_z, cols_z=cols_z, seeds_z=seeds_z,
                rows_u=rows_u, cols_u=cols_u, seeds_u=seeds_u,
                bz=bz, bu=bu, var1_cols=var1_cols, n3=n3, s_m=s_m)


def _warm_start(op, wop, grid, vt0, nu, n_crit, x_trip, m_s, n_w,
                warm_iters: int, x_trip_lower=None):
    """Direct under-relaxed iterations to produce the Newton initial state.

    Mirrors the fixed-point loop of ``coupled.solve_viscous`` but keeps the
    raw BLState arrays so every Newton unknown can be initialised.
    """
    pan = op.pan
    if x_trip_lower is None:
        x_trip_lower = x_trip
    trips = jnp.stack([jnp.asarray(x_trip, pan.xm.dtype),
                       jnp.asarray(x_trip_lower, pan.xm.dtype)])

    march_pair = jax.vmap(
        lambda s, ue, x, xf: march_side(s, ue, x, nu, n_crit, xf))

    def one(sigma_b, sigma_w):
        vt = vt0 + op.due_dsigma @ sigma_b + wop.dvt_dsigw @ sigma_w
        s_mid = 0.5 * (pan.s[:-1] + pan.s[1:])
        ue_u = jnp.maximum(-jnp.interp(grid.s_q_u, s_mid[1:-1], vt[1:-1]),
                           0.02)
        ue_l = jnp.maximum(jnp.interp(grid.s_q_l, s_mid[1:-1], vt[1:-1]),
                           0.02)
        bl2 = march_pair(jnp.stack([grid.xi_u, grid.xi_l]),
                         jnp.stack([ue_u, ue_l]),
                         jnp.stack([grid.x_u, grid.x_l]), trips)
        bl_u = jax.tree.map(lambda a: a[0], bl2)
        bl_l = jax.tree.map(lambda a: a[1], bl2)
        ue_w = wop.uw0 + wop.wb @ sigma_b + wop.ww @ sigma_w
        ue_w = jnp.maximum(blend_te_continuity(
            wop.xi, ue_w, 0.5 * (ue_u[-1] + ue_l[-1])), 0.05)
        return bl_u, bl_l, ue_u, ue_l, ue_w

    def body(carry, _):
        sigma_b, sigma_w = carry
        bl_u, bl_l, ue_u, ue_l, ue_w = one(sigma_b, sigma_w)
        sb = _sigma_from_sides(pan, grid.s0, grid.xi_u, ue_u * bl_u.dstar,
                               grid.xi_l, ue_l * bl_l.dstar)
        th0 = bl_u.theta[-1] + bl_l.theta[-1]
        ds0 = bl_u.dstar[-1] + bl_l.dstar[-1] + grid.te_gap
        hk_w = 1.0 + (ds0 / jnp.maximum(th0, 1e-10) - 1.0) * jnp.exp(
            -grid.xi_w / 0.35)
        ds_w = hk_w * th0
        sw = _smooth_clip_derivative(wop.xi, ue_w * ds_w)
        sb = jnp.where(jnp.isfinite(sb), sb, sigma_b)
        sw = jnp.where(jnp.isfinite(sw), sw, sigma_w)
        # Relative fixed-point residual of the transpiration update — the
        # warm trajectory's own convergence measure (gates its use as a
        # fallback result: an unsettled direct iteration sits near the
        # inviscid solution and must not be served as 'viscous').
        drel = (jnp.mean(jnp.abs(sb - sigma_b))
                / jnp.maximum(jnp.mean(jnp.abs(sb)), 1e-8))
        return (sigma_b + 0.35 * (sb - sigma_b),
                sigma_w + 0.35 * (sw - sigma_w)), drel

    n = pan.xm.shape[0]
    dtype = pan.xm.dtype
    init = (jnp.zeros((n,), dtype), jnp.zeros((n_w,), dtype))
    (sigma_b, sigma_w), drels = jax.lax.scan(body, init, None,
                                             length=warm_iters)
    warm_settled = drels[-1] < 0.10

    bl_u, bl_l, ue_u, ue_l, ue_w = one(sigma_b, sigma_w)

    def side_init(bl, ue):
        theta = jnp.maximum(bl.theta, 1e-9)
        m = jnp.maximum(ue * bl.dstar, 1e-9)
        ct = jnp.where(jnp.isnan(bl.ctau), 1e-4, bl.ctau)
        # n from the march's own amplification integral; a turbulent
        # station (amp is NaN there) starts just past the crossing so its
        # blend weight opens at ~1. Clipped shy of n_crit on the laminar
        # side of a forced trip (the march may have tripped with amp
        # still low — the system's w_trip ramp carries the trip instead).
        n = jnp.where(jnp.isnan(bl.amp), n_crit + 1.5,
                      jnp.clip(bl.amp, 0.0, n_crit + 3.0))
        return jnp.stack([jnp.log(theta), jnp.log(m),
                          jnp.log(jnp.clip(ct, 1e-8, 0.3)), n], axis=1)

    zu = side_init(bl_u, ue_u)
    zl = side_init(bl_l, ue_l)

    th0 = bl_u.theta[-1] + bl_l.theta[-1]
    ds0 = bl_u.dstar[-1] + bl_l.dstar[-1] + grid.te_gap
    hk_w = 1.0 + (ds0 / jnp.maximum(th0, 1e-10) - 1.0) * jnp.exp(
        -grid.xi_w / 0.35)
    t_w = jnp.full_like(grid.xi_w, 1.0) * th0
    m_wk = jnp.maximum(ue_w * hk_w * th0, 1e-9)
    ct_w = jnp.full_like(grid.xi_w, 2e-3)
    zw = jnp.stack([jnp.log(jnp.maximum(t_w, 1e-9)), jnp.log(m_wk),
                    jnp.log(ct_w), jnp.zeros_like(t_w)], axis=1)

    def march_front(bl, x):
        # The march's own transition point; its 'no transition' sentinel is
        # the TE x-value -> map to 2.0 (fully laminar).
        return jnp.where(bl.x_transition < x[-1] - 1e-6,
                         bl.x_transition, jnp.asarray(2.0, x.dtype))

    warm_state = dict(sigma_b=sigma_b, sigma_w=sigma_w, bl_u=bl_u,
                      bl_l=bl_l, ue_u=ue_u, ue_l=ue_l, ue_w=ue_w,
                      settled=warm_settled)
    return (_pack(zu, zl, zw), march_front(bl_u, grid.x_u),
            march_front(bl_l, grid.x_l), warm_state)


def _fallback_scalars(op, wop, grid, vt0, ws, alpha_deg, nu, dtype,
                      cl_inv=None):
    """Polar-point scalars from the warm-start direct trajectory.

    The same extraction as ``coupled.solve_viscous``'s tail (wake march +
    Squire-Young + Cp forces); serves as the in-kernel fallback for polar
    points where the Newton solve flags a wrong basin, replacing a whole
    second direct-solver pass in the batched polar. Returns
    (cl, cd, cdp, cm, ok, xtr_u, xtr_l, sep_fraction).
    """
    from airfoil_tpu.viscous.march import march_wake, wake_ctau0

    bl_u, bl_l = ws["bl_u"], ws["bl_l"]
    ue_u, ue_l, ue_w = ws["ue_u"], ws["ue_l"], ws["ue_w"]
    sigma_b, sigma_w = ws["sigma_b"], ws["sigma_w"]

    vt = vt0 + op.due_dsigma @ sigma_b + wop.dvt_dsigw @ sigma_w
    cp = 1.0 - vt * vt
    cl_c, cm, _cdp_raw = _forces_from_cp(op.pan, cp, alpha_deg)

    th0 = bl_u.theta[-1] + bl_l.theta[-1]
    ds0 = bl_u.dstar[-1] + bl_l.dstar[-1] + grid.te_gap

    ct0 = wake_ctau0(bl_u, bl_l, th0, ds0,
                     0.5 * (ue_u[-1] + ue_l[-1]), nu)
    th_w, _ds_w, hk_w = march_wake(wop.xi, ue_w, nu, th0, ds0, ct0)

    h_end = jnp.clip(hk_w[-1], 1.0, 2.5)
    ue_end = jnp.clip(ue_w[-1], 0.2, 1.5)
    cd = 2.0 * th_w[-1] * ue_end ** (0.5 * (h_end + 5.0))

    def friction_drag(bl, ue, x):
        integrand = bl.cf * ue**2
        return jnp.sum(
            0.5 * (integrand[1:] + integrand[:-1]) * jnp.abs(jnp.diff(x)))

    cdf = (friction_drag(bl_u, ue_u, grid.x_u)
           + friction_drag(bl_l, ue_l, grid.x_l))
    cdp = cd - cdf

    sep = 0.5 * (jnp.mean(bl_u.separated.astype(dtype))
                 + jnp.mean(bl_l.separated.astype(dtype)))
    finite = (jnp.isfinite(cl_c) & jnp.isfinite(cd)
              & jnp.all(jnp.isfinite(sigma_b)))
    cd_lo = 1.0 / jnp.sqrt(1.0 / nu)
    cd_hi = 0.25 * (1.0 / nu) ** -0.2
    ok = (finite & (sep < 0.25) & (cd > cd_lo) & (cd < cd_hi)
          & ws["settled"])
    if cl_inv is not None:
        # Viscosity only ever reduces the circulation magnitude.
        ok = ok & (jnp.abs(cl_c) < 1.05 * jnp.abs(cl_inv) + 0.03)
    return (cl_c, cd, cdp, cm, ok,
            jnp.clip(bl_u.x_transition, 0.0, 1.0),
            jnp.clip(bl_l.x_transition, 0.0, 1.0), sep)


@partial(jax.jit, static_argnames=("n_stations", "n_wake", "warm_iters",
                                   "newton_iters", "outer_rounds"))
def solve_viscous_newton(
    op: InviscidOperator,
    alpha_deg,
    reynolds,
    n_crit: float = 9.0,
    x_forced_transition: float = 1.0,
    n_stations: int = 96,
    n_wake: int = 20,
    warm_iters: int = 8,
    newton_iters: int = 12,
    outer_rounds: int = 4,
    x_forced_transition_lower: float | None = None,
) -> ViscousResult:
    """Coupled viscous solve at one (alpha, Re) by simultaneous Newton
    with transition (the amplification field) inside the system. Budget:
    up to ``outer_rounds`` restart rounds of ``newton_iters`` LM
    iterations, exiting early once settled. Same result contract as
    ``coupled.solve_viscous``; vmap over alpha/Re.

    ``x_forced_transition_lower``: optional separate lower-surface trip
    (XFOIL's ``XTR`` sets the two surfaces independently); ``None`` means
    both surfaces use ``x_forced_transition``.
    """
    # The LM path's basin selection is sensitive to matmul rounding; on
    # TPU the default matmul precision (bf16 passes) diverges from CPU f32
    # and can land a different solution branch. Pin every dot in the solve
    # to full f32.
    with jax.default_matmul_precision("highest"):
        res, _fb, _state = _solve_viscous_newton_impl(
            op, alpha_deg, reynolds, n_crit, x_forced_transition,
            n_stations, n_wake, warm_iters, newton_iters, outer_rounds,
            x_trip_lower=x_forced_transition_lower)
        return res


@partial(jax.jit, static_argnames=("n_stations", "n_wake", "warm_iters",
                                   "newton_iters", "outer_rounds"))
def solve_polar_point(
    op: InviscidOperator,
    alpha_deg,
    reynolds,
    n_crit: float = 9.0,
    x_forced_transition: float = 1.0,
    n_stations: int = 96,
    n_wake: int = 20,
    warm_iters: int = 8,
    newton_iters: int = 10,
    outer_rounds: int = 3,
):
    """One polar point: Newton scalars where converged, else the warm-start
    direct-trajectory fallback (assembled inside the same solve — no second
    solver pass needed in the batched polar).

    Returns ((cl, cd, cdp, cm, converged, xtr_u, xtr_l, sep_fraction),
    (newton_converged, final_state)) — the state feeds the polar's
    continuation pass for points the first pass could not converge.
    """
    with jax.default_matmul_precision("highest"):
        res, fb, state = _solve_viscous_newton_impl(
            op, alpha_deg, reynolds, n_crit, x_forced_transition,
            n_stations, n_wake, warm_iters, newton_iters, outer_rounds)
    return _merge_point(res, fb), (res.converged, state)


def _merge_point(res, fb):
    newton_out = (res.cl, res.cd, res.cdp, res.cm, res.converged,
                  res.upper.x_transition, res.lower.x_transition,
                  res.sep_fraction)
    use_newton = res.converged
    merged = tuple(
        jnp.where(use_newton, a, b) for a, b in zip(newton_out, fb))
    converged = jnp.logical_or(use_newton, fb[4])
    return merged[:4] + (converged,) + merged[5:]


@partial(jax.jit, static_argnames=("n_stations", "n_wake", "warm_iters",
                                   "newton_iters", "outer_rounds"))
def solve_viscous_newton_cont(
    op: InviscidOperator,
    alpha_deg,
    reynolds,
    init_zz,
    init_xtr_u,
    init_xtr_l,
    n_crit: float = 9.0,
    x_forced_transition: float = 1.0,
    n_stations: int = 96,
    n_wake: int = 20,
    warm_iters: int = 1,
    newton_iters: int = 14,
    outer_rounds: int = 3,
) -> ViscousResult:
    """Full-result continuation solve from a donor state: the single-point
    analysis path's rescue (an alpha-bracket walk toward a hard operating
    point) needs the complete ``ViscousResult`` (Cp, BL sides) that the
    merged-scalar polar contract drops."""
    with jax.default_matmul_precision("highest"):
        res, _fb, _state = _solve_viscous_newton_impl(
            op, alpha_deg, reynolds, n_crit, x_forced_transition,
            n_stations, n_wake, warm_iters, newton_iters, outer_rounds,
            init_state=(init_zz, init_xtr_u, init_xtr_l))
    return res


@partial(jax.jit, static_argnames=("n_stations", "n_wake", "warm_iters",
                                   "newton_iters", "outer_rounds"))
def solve_polar_point_cont(
    op: InviscidOperator,
    alpha_deg,
    reynolds,
    init_zz,
    init_xtr_u,
    init_xtr_l,
    n_crit: float = 9.0,
    x_forced_transition: float = 1.0,
    n_stations: int = 96,
    n_wake: int = 20,
    warm_iters: int = 1,
    newton_iters: int = 14,
    outer_rounds: int | None = None,
    cont_slack_add=0.05,
    cont_slack_mul=0.5,
    cont_slack_add_l=None,
    cont_slack_mul_l=None,
    x_forced_transition_lower=None,
):
    """Continuation re-solve of one polar point from a donor state (a
    converged neighbouring-alpha solution). Same contract as
    ``solve_polar_point`` — (merged scalars, (newton_ok, state)) — so chain
    steps can hand their state to the next point. The cheap warm pass only
    feeds the fallback and the interaction-operator extraction.

    ``cont_slack_add``/``cont_slack_mul`` bound how far aft of the donor's
    transition front the target's may sit (see the donor-ceiling comment
    in ``_solve_viscous_newton_impl``); the ``_l`` pair overrides the
    lower side (defaults to the upper's). Traced, so the walk can pass
    direction-dependent slacks without recompiling."""
    if outer_rounds is None:
        outer_rounds = _CONT_ROUNDS
    if cont_slack_add_l is None:
        cont_slack_add_l = cont_slack_add
    if cont_slack_mul_l is None:
        cont_slack_mul_l = cont_slack_mul
    with jax.default_matmul_precision("highest"):
        res, fb, state = _solve_viscous_newton_impl(
            op, alpha_deg, reynolds, n_crit, x_forced_transition,
            n_stations, n_wake, warm_iters, newton_iters, outer_rounds,
            init_state=(init_zz, init_xtr_u, init_xtr_l),
            x_trip_lower=x_forced_transition_lower,
            cont_slack=((jnp.asarray(cont_slack_add),
                         jnp.asarray(cont_slack_mul)),
                        (jnp.asarray(cont_slack_add_l),
                         jnp.asarray(cont_slack_mul_l))))
    return _merge_point(res, fb), (res.converged, state)


def _solve_viscous_newton_impl(
    op: InviscidOperator,
    alpha_deg,
    reynolds,
    n_crit,
    x_forced_transition,
    n_stations,
    n_wake,
    warm_iters,
    newton_iters,
    outer_rounds,
    init_state=None,
    x_trip_lower=None,
    cont_slack=None,
):
    pan = op.pan
    nu = 1.0 / reynolds
    dtype = pan.xm.dtype
    m_s = n_stations
    n_w = n_wake

    sol0 = solve_inviscid(op, alpha_deg)
    vt0 = sol0.vt
    wop: WakeOperator = build_wake_operator(op, alpha_deg, n_wake=n_w)
    te_gap = jnp.hypot(pan.xp[0] - pan.xp[-1], pan.yp[0] - pan.yp[-1])
    s_le = pan.s[jnp.argmin(pan.xp)]
    s_mid = 0.5 * (pan.s[:-1] + pan.s[1:])

    # Freeze the station grid at the inviscid stagnation point (XFOIL
    # likewise freezes the surface split across its Newton iterations).
    s0 = _find_stagnation(s_mid, vt0, s_le)
    xi_u, s_q_u, _ue, x_u, y_u = _side_stations(pan, vt0, s0, True, m_s)
    xi_l, s_q_l, _ue, x_l, y_l = _side_stations(pan, vt0, s0, False, m_s)
    def _trip_coord(x):
        return jnp.where(jnp.arange(x.shape[0]) >= jnp.argmin(x), x,
                         jnp.full_like(x, -1.0))

    grid = _Grid(xi_u=xi_u, xi_l=xi_l, xi_w=wop.xi, x_u=x_u, y_u=y_u,
                 x_l=x_l, y_l=y_l, s_q_u=s_q_u, s_q_l=s_q_l, s0=s0,
                 te_gap=te_gap, xt_u=_trip_coord(x_u),
                 xt_l=_trip_coord(x_l))

    zz0, _xtr_u_march, _xtr_l_march, warm_state = _warm_start(
        op, wop, grid, vt0, nu, n_crit, x_forced_transition, m_s, n_w,
        warm_iters, x_trip_lower=x_trip_lower)

    def _rms(r):
        r = jnp.where(jnp.isfinite(r), r, 1e6)
        return jnp.sqrt(jnp.mean(r * r))

    # ── structured Jacobian ─────────────────────────────────────────────
    # J = scatter(banded dR/dz) + scatter(banded dR/due) @ due/dm @ dm/dz.
    # 18 + 6 colored JVPs replace one dense jacfwd over 3*(2M+W) inputs —
    # the single biggest cost of the LM loop. due/dm = diag(softfloor') @
    # L, with L (the linear interaction operator) extracted ONCE per solve
    # at the warm state (exact modulo the rarely-active derivative clip).
    plan = _seed_plan(m_s, n_w)
    bz = jnp.asarray(plan["bz"], dtype)
    bu = jnp.asarray(plan["bu"], dtype)
    rows_z = jnp.asarray(plan["rows_z"])
    cols_z = jnp.asarray(plan["cols_z"])
    seeds_z = jnp.asarray(plan["seeds_z"])
    rows_u = jnp.asarray(plan["rows_u"])
    cols_u = jnp.asarray(plan["cols_u"])
    seeds_u = jnp.asarray(plan["seeds_u"])
    var1_cols = jnp.asarray(plan["var1_cols"])
    n3 = plan["n3"]

    def raws_of_m(m_all):
        r_u, r_l, r_w, _vt, _sb, _sw = _ue_raws_from_m(
            op, wop, grid, vt0, m_all[:m_s], m_all[m_s:2 * m_s],
            m_all[2 * m_s:])
        return jnp.concatenate([r_u, r_l, r_w])

    # Linearisation point for the interaction operator: the state the LM
    # iteration actually starts from. For continuation solves that is the
    # DONOR state (converged, smooth — the sigma-derivative clips inside
    # raws_of_m are inactive there, making l_mat exact); the barely-settled
    # cheap warm state of a cont solve would fire those clips on its noise
    # spikes and corrupt whole Jacobian rows.
    zz_lin = zz0 if init_state is None else init_state[0]
    zu0_, zl0_, zw0_ = _unpack(zz_lin, m_s, n_w)
    m_lin = jnp.concatenate([jnp.exp(zu0_[:, 1]), jnp.exp(zl0_[:, 1]),
                             jnp.exp(zw0_[:, 1])])
    l_mat = jax.jacfwd(raws_of_m)(m_lin)

    _SF_BETA = 60.0

    n_crit_t = jnp.asarray(n_crit, dtype)
    x_trip_t = jnp.asarray(x_forced_transition, dtype)
    x_trip_lo_t = (x_trip_t if x_trip_lower is None
                   else jnp.asarray(x_trip_lower, dtype))
    # Per-side trip CEILING: the user trip, tightened to the warm march's
    # own front plus slack. The march (leash-forced at laminar separation)
    # cannot run all-laminar, so this closes the coupled system's
    # spurious all-laminar basin (a soft-separated relieved state whose
    # suppressed suction peak never amplifies — observed at 0012@1e6
    # alpha=10: converged, cl 1.02, zero transition) while leaving the
    # n-field free to place transition anywhere EARLIER.
    #
    # The slack is PROPORTIONAL to the march front, not fixed: the
    # march's true-front underestimate scales with the remaining
    # amplification length (measured against XFOIL fronts: march 0.256
    # needs +0.204, march 0.048 needs only +0.112, scratch/
    # probe_march_front.py), while a fixed +0.35 admits the "relieved"
    # late-transition basin at moderate-high alpha — a self-consistent
    # thick-laminar state that parks EXACTLY at the ceiling (measured
    # 2412@1e6 alpha=8-9: xtu 0.397/0.479 = march front + 0.35, CL
    # riding the inviscid slope) and poisons the polar walk above it.
    # 0.15 + 0.6*march covers every measured true front with >= 0.03
    # margin and squeezes out every observed parked basin.
    def _ceiling(front):
        return front + 0.15 + 0.6 * front

    x_trip_u_t = jnp.minimum(x_trip_t, _ceiling(_xtr_u_march))
    x_trip_l_t = jnp.minimum(x_trip_lo_t, _ceiling(_xtr_l_march))

    # Continuation solves additionally pin the front to the DONOR's: the
    # target's transition may not jump far aft of the donor's front. This
    # is what actually holds the walk in the honest basin near stall —
    # measured (2412@1e6, donor alpha 9.5 with xtr_u 0.057): the free
    # continuation solve at alpha 10 slides its front aft and settles the
    # "relieved" late-transition state PARKED EXACTLY AT whatever ceiling
    # it is given (ceiling 0.14 -> xtr 0.140, rms 0.010, self-reports
    # converged; at 10.5 such a parked state even passed the oracle
    # gates with CL +8%), while the forced-trip chain at the same alphas
    # converges honestly. The oracle gates can only REJECT the relieved
    # state; a TIGHT ceiling makes the LM land in the right basin
    # instead. The slack is the caller's (``cont_slack`` = (add, mul),
    # ceiling = add + (1 + mul) x donor front): the polar walk passes a
    # tight ascent slack (fronts only move forward with rising alpha —
    # +0.02 is one station of creep) and a loose descent slack (on the
    # DOWN walk mid-chord fronts legitimately move aft fast). A donor
    # side that never transitioned carries the 2.0 sentinel -> ceiling
    # > 1 -> no constraint.
    # The slack is PER SIDE and direction-dependent because front motion
    # is monotone per side: rising alpha moves the UPPER front forward
    # and the LOWER front aft (mirrored when alpha falls). A tight slack
    # on the advancing side is essential — measured: +0.02 of allowed
    # aft creep per walk step let accepted states ride the ceiling
    # 0.063 -> 0.163 over alpha 9.5 -> 13.5, a smoothly-relieved chain
    # tracking the inviscid slope.
    if init_state is not None and _DONOR_CEIL:
        su, sl = ((0.05, 0.5), (0.05, 0.5)) if cont_slack is None \
            else cont_slack
        x_trip_u_t = jnp.minimum(x_trip_u_t,
                                 su[0] + (1.0 + su[1]) * init_state[1])
        x_trip_l_t = jnp.minimum(x_trip_l_t,
                                 sl[0] + (1.0 + sl[1]) * init_state[2])

    def jac_fn(zz):
        zu, zl, zw = _unpack(zz, m_s, n_w)
        m_all = jnp.concatenate([
            jnp.exp(zu[:, 1]), jnp.exp(zl[:, 1]), jnp.exp(zw[:, 1])])
        raws = raws_of_m(m_all)
        floors = jnp.concatenate([
            jnp.full((2 * m_s,), _UE_FLOOR_BODY, dtype),
            jnp.full((n_w,), _UE_FLOOR_WAKE, dtype)])
        ues = _soft_floor(raws, floors)
        ue_u, ue_l, ue_w = (ues[:m_s], ues[m_s:2 * m_s],
                            ues[2 * m_s:])

        def r_of_cz(c):
            return _residual_given_ue(zz + bz @ c, ue_u, ue_l, ue_w,
                                      grid, nu, m_s, n_w,
                                      n_crit_t, x_trip_u_t, x_trip_l_t)

        def r_of_cu(c):
            du = bu @ c
            return _residual_given_ue(
                zz, ue_u + du[:m_s], ue_l + du[m_s:2 * m_s],
                ue_w + du[2 * m_s:], grid, nu, m_s, n_w,
                n_crit_t, x_trip_u_t, x_trip_l_t)

        jbz = jax.jacfwd(r_of_cz)(jnp.zeros((6 * _N_VARS,), dtype))
        jbu = jax.jacfwd(r_of_cu)(jnp.zeros((6,), dtype))

        jac = jnp.zeros((n3, n3), dtype).at[rows_z, cols_z].set(
            jbz[rows_z, seeds_z])
        ju = jnp.zeros((n3, plan["s_m"]), dtype).at[
            rows_u, cols_u].set(jbu[rows_u, seeds_u])

        sfp = jax.nn.sigmoid(_SF_BETA * (raws - floors))
        j_via_ue = (ju * sfp[None, :]) @ l_mat
        jac = jac.at[:, var1_cols].add(j_via_ue * m_all[None, :])
        return jac

    # Levenberg-Marquardt with adaptive damping. Plain Newton + line search
    # deadlocks on this system (locally-non-smooth spots at the transition
    # station mislead the linearisation); LM's gradient-interpolated steps
    # walk through them. Each iteration solves a small batch of candidate
    # dampings at once (batched dense solves are near-free on the MXU) and
    # keeps the best descent.
    _LAM_FACTORS = jnp.asarray([0.33, 1.0, 8.0, 64.0], dtype)
    # Per-variable-type step limits: tight on the thickness log-variables
    # (whose runaway flips the solve into an unphysical basin), loose on
    # ln ctau (which legitimately moves O(1) as the front settles) and on
    # n (which legitimately travels O(n_crit) as the front moves).
    _STEP_CLIP = jnp.tile(jnp.asarray([0.25, 0.25, 1.0, 2.0], dtype),
                          2 * m_s + n_w)

    def run_lm(res, jac_fn, zz, lam, iters):
        def lm_step(carry, _):
            zz, lam = carry
            r = res(zz)
            rms_here = _rms(r)
            jac = jac_fn(zz)
            jtj = jac.T @ jac
            jtr = jac.T @ r
            diag = jnp.maximum(jnp.diag(jtj), 1e-8)

            def candidate(factor):
                # (J^T J + lam D) is SPD by construction: Cholesky +
                # two triangular solves, ~2-3x cheaper than the pivoted
                # LU jnp.linalg.solve would run — these P x 4 batched
                # dense solves are the single largest cost of a polar.
                a = jtj + jnp.diag(lam * factor * diag)
                chol = jax.lax.linalg.cholesky(a)
                dz = jax.lax.linalg.triangular_solve(
                    chol,
                    jax.lax.linalg.triangular_solve(
                        chol, -jtr[:, None], left_side=True, lower=True),
                    left_side=True, lower=True, transpose_a=True)[:, 0]
                dz = jnp.clip(dz, -_STEP_CLIP, _STEP_CLIP)
                dz = jnp.where(jnp.all(jnp.isfinite(dz)), dz,
                               jnp.zeros_like(dz))
                return dz, _rms(res(zz + dz))

            dzs, rmss = jax.vmap(candidate)(_LAM_FACTORS)
            # Deterministic near-tie handling: among candidates within 1%
            # of the best rms, take the gentlest damping. A bare argmin
            # amplifies f32 rounding noise into different step SEQUENCES
            # between compilation contexts (vmapped vs scalar vs fused
            # into a larger kernel), which made borderline solves flip
            # basins between the polar kernel and standalone calls.
            rbest = jnp.min(rmss)
            near = rmss <= rbest * 1.01
            best = jnp.argmax(near)          # first (smallest factor) hit
            accept = rmss[best] < rms_here
            zz = jnp.where(accept, zz + dzs[best], zz)
            lam = jnp.clip(jnp.where(accept, lam * _LAM_FACTORS[best] / 3.0,
                                     lam * 64.0), 1e-7, 1e6)
            return (zz, lam), rms_here

        (zz, lam), _ = jax.lax.scan(lm_step, (zz, lam), None, length=iters)
        return zz, lam

    res_fn = partial(_residual, op=op, wop=wop, grid=grid, vt0=vt0, nu=nu,
                     m_s=m_s, n_w=n_w, n_crit=n_crit_t,
                     x_trip_u=x_trip_u_t, x_trip_l=x_trip_l_t)

    # ── LM rounds ───────────────────────────────────────────────────────
    # Transition lives inside the system (the n column), so there is no
    # outer front↔field leapfrog: ``outer_rounds`` is a CAP on restart
    # rounds of ``newton_iters`` LM iterations each, with the damping
    # floor re-applied between rounds (a restart unsticks an LM that
    # drove its damping up in a stiff corner). A point exits early once
    # SETTLED (rms below the convergence gate) or FUTILE (a round made
    # < 8% relative progress); under vmap the while_loop runs until every
    # lane is done, so a batch costs its hardest member.
    if init_state is None:
        zz_i = zz0
    else:
        zz_i = init_state[0]

    def _reproject_n(zz):
        """Exact re-integration of the amplification ODE over the current
        iterate's own profile (saturation gate evaluated on the carried
        n — a scalar scan per side). The n-rows' fixed point is unchanged;
        this removes
        their slow drift mode: LM alone leaves a systematic per-interval
        n misfit of ~0.04 within the rms budget, which moves a marginal
        crossing by ~0.2c (measured as a 0.23c upper/lower transition
        asymmetry on 0012 at alpha = 0)."""
        zu, zl, zw = _unpack(zz, m_s, n_w)
        ue_u, ue_l, _uw, _vt2, _sb2, _sw2 = _ue_from_m(
            op, wop, grid, vt0, jnp.exp(zu[:, 1]), jnp.exp(zl[:, 1]),
            jnp.exp(zw[:, 1]))

        def side_n(z_side, ue, xi, x, x_trip_side):
            theta = jnp.maximum(jnp.exp(z_side[:, 0]), 1e-10)
            dstar = jnp.exp(z_side[:, 1]) / jnp.maximum(ue, 0.02)
            hk = jnp.clip(dstar / theta, 1.005, 12.0)
            ret = jnp.maximum(ue * theta / nu, 1.0)
            rate = cl.amplification_rate(hk, theta, ret)

            def step(n1, inp):
                r1, r2, ds, x1 = inp
                n2 = n1 + _avg(r1, r2) * _n_sat_gate(n1, n_crit_t) * ds
                n2 = jnp.clip(n2, 0.0, n_crit_t + 3.0)
                return n2, n2

            dxi = jnp.maximum(jnp.diff(xi), 1e-8)
            _nf, n_rest = jax.lax.scan(
                step, jnp.zeros((), dtype),
                (rate[:-1], rate[1:], dxi, x[:-1]))
            return jnp.concatenate([jnp.zeros((1,), dtype), n_rest])

        n_u = side_n(zu, ue_u, grid.xi_u, grid.x_u, x_trip_u_t)
        n_l = side_n(zl, ue_l, grid.xi_l, grid.x_l, x_trip_l_t)
        zu = zu.at[:, 3].set(n_u)
        zl = zl.at[:, 3].set(n_l)
        zw = zw.at[:, 3].set(jnp.zeros_like(zw[:, 3]))
        return jax.lax.stop_gradient(_pack(zu, zl, zw))

    # ── oracle drift probe + reseed ─────────────────────────────────────
    # The interval equations carry attached/separated root PAIRS at the
    # TE recovery: from an attached donor the LM inherits the thin
    # (attached) branch as alpha climbs, and a continuation chain then
    # rides a smoothly-thinning lie toward the inviscid slope (measured
    # 2412@1e6: chain CL 1.56 at alpha 12 with lift deficit 0.13, vs the
    # thick root's 1.45 / 0.24 — XFOIL 1.42 / 0.26 — with IDENTICAL
    # transition fronts). The sequential pinned march is parabolic —
    # given the field and the front its thickness evolution is unique —
    # so it arbitrates: a side whose TE theta sits > 1.30x the system's
    # march value is thin-drifted; its (ln theta, ln m, ln ctau) rows
    # reseed from the march profile before the next LM round, and a
    # drifted state can never claim convergence. Validity mirrors the
    # final gate: the ratio only counts when the march actually reached
    # the front (its laminar-separation backstop can pre-fire in a steep
    # suction peak, inflating theta for reasons unrelated to drift).
    march_pinned = jax.vmap(
        lambda s, ue, x, xf: march_side(s, ue, x, nu, 1e9, xf))

    def _front_of(z_side, x, xt, x_trip_side):
        w = _w_station(z_side[:, 3], xt, n_crit_t, x_trip_side)
        hit = w >= 0.5
        i = jnp.argmax(hit)
        return jnp.where(jnp.any(hit), x[i], jnp.asarray(2.0, dtype))

    def _oracle_probe(zz):
        zu, zl, zw = _unpack(zz, m_s, n_w)
        ue_u, ue_l, _uw, _vt3, _sb3, _sw3 = _ue_from_m(
            op, wop, grid, vt0, jnp.exp(zu[:, 1]), jnp.exp(zl[:, 1]),
            jnp.exp(zw[:, 1]))
        f_u = jnp.minimum(_front_of(zu, grid.x_u, grid.xt_u, x_trip_u_t),
                          x_trip_u_t)
        f_l = jnp.minimum(_front_of(zl, grid.x_l, grid.xt_l, x_trip_l_t),
                          x_trip_l_t)
        bl2 = march_pinned(jnp.stack([grid.xi_u, grid.xi_l]),
                           jnp.stack([ue_u, ue_l]),
                           jnp.stack([grid.x_u, grid.x_l]),
                           jnp.stack([f_u, f_l]))
        r_u = bl2.theta[0, -1] / jnp.maximum(jnp.exp(zu[-1, 0]), 1e-10)
        r_l = bl2.theta[1, -1] / jnp.maximum(jnp.exp(zl[-1, 0]), 1e-10)
        valid_u = bl2.x_transition[0] >= jnp.minimum(f_u, 1.0) - 0.015
        valid_l = bl2.x_transition[1] >= jnp.minimum(f_l, 1.0) - 0.015
        drift_u = jnp.logical_and(valid_u, r_u > 1.30)
        drift_l = jnp.logical_and(valid_l, r_l > 1.30)
        return bl2, (ue_u, ue_l), (drift_u, drift_l)

    def _reseed_side(z, drift, th_m, ds_m, ct_m, ue):
        th = jnp.maximum(th_m, 1e-9)
        m = jnp.maximum(ue * ds_m, 1e-9)
        ct = jnp.where(jnp.isnan(ct_m), jnp.exp(z[:, 2]), ct_m)
        z_new = z.at[:, 0].set(jnp.log(th))
        z_new = z_new.at[:, 1].set(jnp.log(m))
        z_new = z_new.at[:, 2].set(jnp.log(jnp.clip(ct, 1e-8, 0.3)))
        return jnp.where(drift, z_new, z)

    def _oracle_reseed(zz, bl2, ues, drifts):
        zu, zl, zw = _unpack(zz, m_s, n_w)
        zu = _reseed_side(zu, drifts[0], bl2.theta[0], bl2.dstar[0],
                          bl2.ctau[0], ues[0])
        zl = _reseed_side(zl, drifts[1], bl2.theta[1], bl2.dstar[1],
                          bl2.ctau[1], ues[1])
        return jax.lax.stop_gradient(_pack(zu, zl, zw))

    def fp_cond(carry):
        _zz, _lam, k, _best_zz, _best_rms, rms_prev, done = carry
        return jnp.logical_and(k < outer_rounds, jnp.logical_not(done))

    def fp_round(carry):
        zz, lam, k, best_zz, best_rms, rms_prev, done = carry
        zz = _reproject_n(zz)
        if _ORACLE_RESEED:
            bl2, ues, drifts = _oracle_probe(zz)
            reseeded = jnp.logical_or(drifts[0], drifts[1])
            zz = _oracle_reseed(zz, bl2, ues, drifts)
            lam = jnp.where(reseeded, jnp.maximum(lam, 1e-3), lam)
        else:
            reseeded = jnp.array(False)
        zz, lam = run_lm(res_fn, jac_fn, zz, jnp.maximum(lam, 1e-4),
                         newton_iters)
        rms_r = _rms(res_fn(zz))
        if _ORACLE_RESEED:
            _bl3, _ues3, drifts3 = _oracle_probe(zz)
            drifted3 = jnp.logical_or(drifts3[0], drifts3[1])
        else:
            drifted3 = jnp.array(False)
        ok_r = jnp.logical_and(
            jnp.logical_and(rms_r < best_rms, jnp.all(jnp.isfinite(zz))),
            jnp.logical_not(drifted3))
        best_zz = jnp.where(ok_r, zz, best_zz)
        best_rms = jnp.where(ok_r, rms_r, best_rms)
        # A round that reseeded legitimately RAISES the rms (it moved the
        # state to the thick branch) — futility must not read that as a
        # stall; and a thin-drifted state may not exit via the settled
        # gate (the next round's reseed is the whole point).
        rms_exit = _RMS_SETTLED if _SETTLED_EXIT else _RMS_OK
        done = jnp.logical_or(
            jnp.logical_and(rms_r < rms_exit,
                            jnp.logical_not(drifted3)),
            jnp.logical_and(rms_r > _FUTILITY * rms_prev,
                            jnp.logical_not(reseeded)))
        if os.environ.get("AIRFOIL_TPU_DEBUG_ROUNDS"):
            jax.debug.print(
                "round a={a:.1f} k={k} rms={r:.4f} reseed={rs} "
                "drift3={d3} done={d}",
                a=alpha_deg, k=k, r=rms_r, rs=reseeded, d3=drifted3,
                d=done)
        return (zz, lam, k + 1, best_zz, best_rms, rms_r, done)

    carry0 = (zz_i, jnp.asarray(1e-3, dtype), jnp.zeros((), jnp.int32),
              zz_i, jnp.asarray(jnp.inf, dtype),
              jnp.asarray(jnp.inf, dtype), jnp.array(False))
    (_zz_f, _lam, _k, zz, rms, _rms_p, _done) = jax.lax.while_loop(
        fp_cond, fp_round, carry0)

    # Transition fronts from the solved n field (0.5-crossing of the
    # blend weight, interpolated) — derived output, not solver state.
    def xtr_of(z_side, x, xt, x_trip_side):
        w = _w_station(z_side[:, 3], xt, n_crit_t, x_trip_side)
        hit = w >= 0.5
        i = jnp.argmax(hit)
        i1 = jnp.clip(i, 1, x.shape[0] - 1)
        dw = w[i1] - w[i1 - 1]
        frac = jnp.clip((0.5 - w[i1 - 1]) / jnp.where(
            jnp.abs(dw) < 1e-12, 1.0, dw), 0.0, 1.0)
        xc = x[i1 - 1] + frac * (x[i1] - x[i1 - 1])
        xc = jnp.where(i == 0, x[0], xc)
        return jnp.where(jnp.any(hit), xc, jnp.asarray(2.0, dtype))

    zu_x, zl_x, _zw_x = _unpack(zz, m_s, n_w)
    xtr_u = xtr_of(zu_x, grid.x_u, grid.xt_u, x_trip_u_t)
    xtr_l = xtr_of(zl_x, grid.x_l, grid.xt_l, x_trip_l_t)
    w_u = _w_station(zu_x[:, 3], grid.xt_u, n_crit_t, x_trip_u_t)
    w_l = _w_station(zl_x[:, 3], grid.xt_l, n_crit_t, x_trip_l_t)

    # ── extract the solution ────────────────────────────────────────────
    zu, zl, zw = _unpack(zz, m_s, n_w)
    m_u = jnp.exp(zu[:, 1])
    m_l = jnp.exp(zl[:, 1])
    m_w = jnp.exp(zw[:, 1])
    ue_u, ue_l, ue_w, vt, sigma_b, sigma_w = _ue_from_m(
        op, wop, grid, vt0, m_u, m_l, m_w)

    cp = 1.0 - vt * vt
    cl_c, cm, _cdp_raw = _forces_from_cp(pan, cp, alpha_deg)

    # Squire-Young extrapolation from the wake end.
    th_w_end = jnp.exp(zw[-1, 0])
    d_w_end = m_w[-1] / ue_w[-1]
    h_end = jnp.clip(d_w_end / jnp.maximum(th_w_end, 1e-10), 1.0, 2.5)
    ue_end = jnp.clip(ue_w[-1], 0.2, 1.5)
    cd = 2.0 * th_w_end * ue_end ** (0.5 * (h_end + 5.0))

    def side_out(z, ue, xi, x, y, w, xtr):
        theta = jnp.exp(z[:, 0])
        dstar = jnp.exp(z[:, 1]) / ue
        hk = jnp.clip(dstar / jnp.maximum(theta, 1e-10), 1.005, 12.0)
        ret = jnp.maximum(ue * theta / nu, 1.0)
        cf_l = cl.lam_cf(hk, ret)
        cf_t = cl.turb_cf(hk, ret)
        cf = (1.0 - w) * cf_l + w * cf_t
        turb = w > 0.5
        # Three separation counts with different jobs. ``sep`` (reported
        # in the API's sep_fraction) uses the physical detachment onset:
        # a turbulent layer detaches around Hk ~ 2.9 (Cf -> 0 in the
        # turbulent Cf correlation). ``sep_gate`` (the convergence
        # verdict's separation CAP) keeps the march Hk caps: the round-4
        # attempt to gate on the physical count loosened cd_hi enough to
        # serve 2412@2e5 alpha=0 at CD +80% (measured in the round-5
        # parity A/B). ``sep_rear`` (which SCALES cd_hi and the lift-
        # deficit band) counts physical detachment only over TURBULENT
        # REAR-HALF stations: genuine stall separation lives at the
        # turbulent TE, while the low-Re laminar bubbles that fooled the
        # round-4 diagnostic live near the LE / mid-chord laminar run and
        # are excluded by both masks.
        sep = hk > jnp.where(turb, 2.9, cl.HK_LAM_MAX)
        sep_gate = sep if _SEP_DIAG_29 else (
            hk > jnp.where(turb, cl.HK_TURB_MAX, cl.HK_LAM_MAX))
        rear = x > 0.5
        sep_rear = (jnp.sum((turb & (hk > 2.9) & rear).astype(x.dtype))
                    / jnp.maximum(jnp.sum(rear.astype(x.dtype)), 1.0))
        side = SideBL(x=x, y=y, s=xi, ue=ue, theta=theta, dstar=dstar,
                      hk=hk, cf=cf, turb=turb,
                      x_transition=jnp.clip(jnp.minimum(xtr, x[-1]),
                                            0.0, 1.0))
        return side, cf, sep, sep_gate, sep_rear

    upper, cf_u, sep_u, sepg_u, sep_rear_u = side_out(
        zu, ue_u, grid.xi_u, grid.x_u, grid.y_u, w_u, xtr_u)
    lower, cf_l_arr, sep_l, sepg_l, sep_rear_l = side_out(
        zl, ue_l, grid.xi_l, grid.x_l, grid.y_l, w_l, xtr_l)

    def friction_drag(cf, ue, x):
        integrand = cf * ue**2
        return jnp.sum(
            0.5 * (integrand[1:] + integrand[:-1]) * jnp.abs(jnp.diff(x)))

    cdf = friction_drag(cf_u, ue_u, grid.x_u) + friction_drag(
        cf_l_arr, ue_l, grid.x_l)
    cdp = cd - cdf

    sep_fraction = 0.5 * (jnp.mean(sep_u.astype(dtype))
                          + jnp.mean(sep_l.astype(dtype)))
    sep_gate_fraction = 0.5 * (jnp.mean(sepg_u.astype(dtype))
                               + jnp.mean(sepg_l.astype(dtype)))
    # Stall-separation scale for the cd_hi ceiling and the deficit band:
    # the larger side's rear-turbulent detached fraction (stall is
    # one-sided; averaging the sides would halve the signal).
    sep_rear_fraction = jnp.maximum(sep_rear_u, sep_rear_l)

    # Physical sanity joins the rms test in the convergence verdict: a
    # viscous CL beyond the inviscid one, a huge lift deficit, or a CD
    # outside the laminar...post-stall envelope for this Reynolds number
    # marks a wrong-basin solution even when the residual is small.
    cl_inv = sol0.cl
    # The lift deficit grows with separation: pre-stall it stays within
    # ~35% of the inviscid CL, but a genuine near-CL_max solution sheds
    # up to ~half the inviscid circulation. Widen the deficit band with
    # the separated fraction so the gate stops vetoing real stall states
    # while still catching pre-stall wrong-basin lift collapse.
    deficit_band = (0.35 + 0.8 * jnp.clip(sep_rear_fraction, 0.0, 0.4)) \
        * jnp.abs(cl_inv)
    cl_sane = jnp.logical_and(
        jnp.abs(cl_c - cl_inv) < jnp.maximum(deficit_band, 0.15),
        # Viscosity only ever reduces the circulation magnitude.
        jnp.abs(cl_c) < 1.05 * jnp.abs(cl_inv) + 0.03)
    cd_lo = 1.0 / jnp.sqrt(reynolds)          # ~0.4x fully-laminar plate
    # Attached-flow ceiling ~2x the turbulent flat plate; separation adds
    # pressure drag far beyond it (CD ~ 0.03-0.10 through CL_max), so the
    # ceiling scales with the separated fraction — without this the gate
    # structurally rejected every post-peak solution (at Re=1e6 the
    # attached ceiling is 0.0158; real stall CD is double that). The
    # ceiling is a WRONG-BASIN guard, not an accuracy test; the
    # coefficients live at module level (_CD_HI_COEF/_CD_HI_SEP) so stall
    # campaigns can A/B a looser ceiling without editing the trace.
    cd_hi = _CD_HI_COEF * reynolds ** -0.2 \
        + _CD_HI_SEP * jnp.clip(sep_rear_fraction, 0.0, 0.4)
    cd_sane = jnp.logical_and(cd > cd_lo, cd < cd_hi)
    finite = (jnp.all(jnp.isfinite(zz)) & jnp.isfinite(cl_c)
              & jnp.isfinite(cd))

    # Oracle check: a sequential march over the converged edge-velocity
    # field must reproduce the system's TE momentum thickness. The march
    # is parabolic/unique, so a small-residual wrong-basin solution (e.g.
    # a near-inviscid state at high alpha whose thin BL the sanity bands
    # cannot reject) fails this even when everything else passes.
    # The oracle march transitions EXACTLY at the system's own front: the
    # forced trip is both floor and ceiling (free e^N amplification is
    # disabled with an unreachable n_crit; the march's laminar-separation
    # forcing still backstops an all-laminar field). Leaving the march's
    # own amplification on made the forced front only a CEILING — in a
    # steep suction peak (alpha >= 12) the march's envelope fired ~0.02c
    # before the system's front, started the turbulent layer ~25%
    # thicker, and the difference compounded to ratio ~1.7 by the TE:
    # every HONEST near-stall state was vetoed (measured 2412@1e6@12:
    # system CD 0.0135 vs truth 0.0146, ratio 1.679 > 1.6), which starved
    # the polar walk of stall donors — no CL_max could ever appear. The
    # check's subject is the thickness evolution, not transition.
    # Four march lanes in one vmap: per side, one PINNED lane (free
    # amplification off, forced exactly at the system's front — tests the
    # thickness evolution given the front) and one FREE lane (real e^N
    # over the converged edge-velocity field, forced only at the user
    # trip — an independent estimate of where transition BELONGS on this
    # field). The pinned lanes feed the theta-ratio gate; the free lanes
    # feed the front gate below.
    march_pair2 = jax.vmap(
        lambda s, ue, x, nc, xf: march_side(s, ue, x, nu, nc, xf))
    big = jnp.asarray(1e9, dtype)
    # _PER_SIDE_RATIO False restores the round-3 theta lanes: free
    # amplification ON (the march may fire before the forced front).
    nc_theta = big if _PER_SIDE_RATIO else n_crit_t
    bl_chk = march_pair2(
        jnp.stack([grid.xi_u, grid.xi_l, grid.xi_u, grid.xi_l]),
        jnp.stack([ue_u, ue_l, ue_u, ue_l]),
        jnp.stack([grid.x_u, grid.x_l, grid.x_u, grid.x_l]),
        jnp.stack([nc_theta, nc_theta, n_crit_t, n_crit_t]),
        jnp.stack([jnp.minimum(xtr_u, x_trip_t),
                   jnp.minimum(xtr_l, x_trip_lo_t),
                   x_trip_t, x_trip_lo_t]))
    # Per-side TE-theta ratios, each VALID only when the pinned lane
    # actually reached the system's front: the pinned march cannot
    # free-transition, but its laminar-separation backstop can fire
    # BEFORE the forced front (at high alpha a laminar layer cannot
    # cross the suction-peak recovery much past ~0.05c of separated
    # run) — the march then runs turbulent early for reasons unrelated
    # to wrong-basin-ness and its TE theta is meaningless as an oracle
    # (measured: ratio alternating 1.1 / 3.5 between neighbouring
    # half-degree steps of an otherwise smooth continuation chain, the
    # backstop firing marginally before/after the trip).
    # The oracle's two directions are NOT symmetric. ratio >> 1 (march
    # grows a much thicker layer than the system claims) marks the
    # spurious near-inviscid thin-BL branch — always reject; a
    # continuation chain that hands one such state forward otherwise walks
    # a whole smoothly-wrong polar tail (CD ~ half physical at post-stall
    # alphas). ratio << 1 can be legitimate: the march's Hk caps cannot
    # reproduce a genuinely separated TE region, so there the simultaneous
    # system is the better truth and the separation gate decides.
    def _side_ratio_ok(th_march, th_side, pinned_front, forced_front):
        valid = pinned_front >= jnp.minimum(forced_front, 1.0) - 0.015
        r = th_march / jnp.maximum(th_side, 1e-10)
        # Thin-side bound 1.40 (was 1.6 on the summed ratio): the
        # continuation chain's thin-branch drift passes 1.45-1.55 while
        # honest states sit <= ~1.25 (cold thick root at 2412@1e6
        # alpha=12: 1.24); the in-loop oracle reseed above makes the
        # tighter bound affordable (drifted states get pulled back to
        # the thick branch instead of just failing).
        ok = jnp.logical_and(
            r < 1.40, jnp.logical_or(r > 0.6, sep_rear_fraction > 0.02))
        return jnp.logical_or(jnp.logical_not(valid), ok)

    ratio = (bl_chk.theta[0, -1] + bl_chk.theta[1, -1]) / jnp.maximum(
        jnp.exp(zu[-1, 0]) + jnp.exp(zl[-1, 0]), 1e-10)
    if _PER_SIDE_RATIO:
        march_consistent = jnp.logical_and(
            _side_ratio_ok(bl_chk.theta[0, -1], jnp.exp(zu[-1, 0]),
                           bl_chk.x_transition[0],
                           jnp.minimum(xtr_u, x_trip_t)),
            _side_ratio_ok(bl_chk.theta[1, -1], jnp.exp(zl[-1, 0]),
                           bl_chk.x_transition[1],
                           jnp.minimum(xtr_l, x_trip_lo_t)))
    else:
        march_consistent = jnp.logical_and(
            ratio < 1.6,
            jnp.logical_or(ratio > 0.6, sep_rear_fraction > 0.02))

    # Front gate: the system's transition front must not sit far AFT of
    # the free march's own front over the same (converged) field. This is
    # the veto for the "relieved" late-transition basin — a
    # self-consistent state whose suppressed suction peak never amplifies
    # (observed: xtr_u jumping 0.61 -> 0.93 between alpha 1.5 and 2.0 on
    # 2412@1e6 while CL stayed on trend). The pinned theta-ratio above
    # cannot see it (it is HANDED the wrong front), and the warm-march
    # trip ceiling is too slack aft of midchord (ceiling(0.6) > 1). The
    # slack is proportional: the free march fires up to ~0.02c early in a
    # steep suction peak (near-stall fronts ~0.03 stay clear at slack
    # 0.10) and shares the system's own closure biases mid-chord, so a
    # basin-consistent front sits well inside 0.10 + 0.25 x front; the
    # relieved basin sits ~0.3-0.4 aft of it. A ceiling >= 1 means "no
    # constraint" (covers genuinely-laminar-to-TE sides, where the free
    # lane reports its no-fire sentinel x[-1]).
    def _front_gate(xtr_sys, xtr_free):
        ceil_f = 0.10 + 1.25 * xtr_free
        return jnp.logical_or(ceil_f >= 1.0,
                              jnp.minimum(xtr_sys, 1.0) <= ceil_f)

    front_consistent = jnp.logical_and(
        _front_gate(xtr_u, bl_chk.x_transition[2]),
        _front_gate(xtr_l, bl_chk.x_transition[3]))
    if _FRONT_GATE:
        march_consistent = jnp.logical_and(march_consistent,
                                           front_consistent)

    # Separation cap 0.50 (with the Hk > 2.9 diagnostic onset above —
    # the cap was 0.40 when separation counted only from the march's 4.0
    # stepping cap): CL_max states legitimately carry ~1/3-1/2 of their
    # stations past detachment; beyond half the closure set is out of
    # its envelope and the result is untrustworthy regardless.
    sep_cap = 0.50 if _SEP_DIAG_29 else 0.40
    converged = (finite & (rms < _RMS_OK) & (sep_gate_fraction < sep_cap)
                 & cl_sane & cd_sane & march_consistent)

    import os as _os
    if _os.environ.get("AIRFOIL_TPU_DEBUG_GATES"):     # dev diagnostics
        jax.debug.print(
            "gates a={a:.1f} rms={rms:.4f} sep={sep:.3f} cl={cl:.3f} "
            "cl_inv={ci:.3f} cd={cd:.5f} cd_hi={ch:.4f} ratio={r:.2f} "
            "cl_sane={cs} cd_sane={ds} march={mc} "
            "xtru={xu:.3f}/free={fu:.3f} xtrl={xl:.3f}/free={fl:.3f} "
            "front={fo}",
            a=alpha_deg, rms=rms, sep=sep_fraction, cl=cl_c, ci=cl_inv,
            cd=cd, ch=cd_hi, r=ratio, cs=cl_sane, ds=cd_sane,
            mc=march_consistent, xu=xtr_u, fu=bl_chk.x_transition[2],
            xl=xtr_l, fl=bl_chk.x_transition[3], fo=front_consistent)

    res = ViscousResult(
        cl=cl_c, cd=cd, cdp=cdp, cm=cm, cp=cp,
        upper=upper, lower=lower,
        converged=converged, sep_fraction=sep_fraction,
        sigma=sigma_b, sigma_wake=sigma_w,
    )
    fb = _fallback_scalars(op, wop, grid, vt0, warm_state, alpha_deg, nu,
                           dtype, cl_inv=sol0.cl)
    # The state's front slots carry min(system front, FREE-march front):
    # they exist to seed the next continuation step's donor ceiling, and
    # the free march over the converged field is the closure-consistent
    # e^N front — systematically FORWARD of a mildly-relieved system
    # front. Handing the system's own front forward lets relief compound
    # (+0.005 ceiling creep per step walked the 2412 chain to xtr 0.084 /
    # CL 2.03 at alpha 15.5 with sep still 0.005 — a thin-BL drift with
    # no CL_max); the march front PULLS the chain back toward honest
    # amplification each step. min() keeps free-march noise (it can fire
    # spuriously late over a separated recovery) from LOOSENING the
    # ceiling.
    if _SEED_FREE_FRONT:
        xtr_u_seed = jnp.minimum(xtr_u, bl_chk.x_transition[2])
        xtr_l_seed = jnp.minimum(xtr_l, bl_chk.x_transition[3])
    else:
        xtr_u_seed, xtr_l_seed = xtr_u, xtr_l
    return res, fb, (zz, xtr_u_seed, xtr_l_seed)
