"""Viscous-inviscid coupled airfoil solve.

This module is the TPU-native equivalent of the reference's Strategy-1/2
payload: one XFOIL viscous analysis (reference main.py:294-313, script
``VISC re / ITER 500 / ALFA a`` at main.py:362-366). The architecture:

1. One inviscid panel solve fixes the edge-velocity baseline ``Vt0`` and the
   precomputed sensitivities ``d(Vt)/d(sigma_body)`` (build_operator) and
   ``d(Vt)/d(sigma_wake)`` (build_wake_operator).
2. The surface is split at the stagnation point (the ``Vt`` zero crossing
   nearest the LE) and each side's edge velocity is re-sampled onto a fixed
   station grid — static shapes regardless of alpha, which is what makes
   the whole solve ``vmap``-able over (alpha, Re).
3. Each side is marched (viscous.march) and its displacement body fed back
   as transpiration sources ``sigma = d(Ue dstar)/ds``; the merged TE state
   continues down a freestream-aligned wake line whose sources carry the
   viscous decambering into the Kutta condition (most of the CL decrement).
4. Steps 2-3 iterate a fixed number of under-relaxed passes (lax.scan) —
   the role of XFOIL's global Newton cycle (ITER 500), with masked
   convergence detection instead of data-dependent iteration counts.
5. Profile drag comes from the Squire-Young extrapolation at the wake end;
   friction drag from integrating Cf; Cp/CL/Cm from the final transpired
   surface speeds.

Non-convergence (stall, massive separation) surfaces as ``converged=False``
— the batched analog of XFOIL's "VISCAL: Convergence failed" string that
drives the reference's strategy fallback (main.py:441-447).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from airfoil_tpu.inviscid.panel_solver import (
    InviscidOperator,
    _freestream,
    solve_inviscid,
)
from airfoil_tpu.viscous.march import (
    BLState,
    march_side,
    march_wake,
    wake_ctau0,
)
from airfoil_tpu.viscous.wake import (
    WakeOperator,
    blend_te_continuity,
    build_wake_operator,
)

__all__ = ["SideBL", "ViscousResult", "solve_viscous"]


class SideBL(NamedTuple):
    """Boundary-layer arrays along one side, stagnation -> trailing edge."""

    x: jnp.ndarray
    y: jnp.ndarray
    s: jnp.ndarray        # arc distance from stagnation point
    ue: jnp.ndarray       # edge velocity / U_inf (final coupled)
    theta: jnp.ndarray
    dstar: jnp.ndarray
    hk: jnp.ndarray
    cf: jnp.ndarray
    turb: jnp.ndarray
    x_transition: jnp.ndarray


class ViscousResult(NamedTuple):
    cl: jnp.ndarray
    cd: jnp.ndarray
    cdp: jnp.ndarray      # pressure (form) drag = cd - cd_friction
    cm: jnp.ndarray
    cp: jnp.ndarray       # (N,) viscous Cp at panel midpoints
    upper: SideBL
    lower: SideBL
    converged: jnp.ndarray       # bool
    sep_fraction: jnp.ndarray    # fraction of stations with Hk cap engaged
    sigma: jnp.ndarray           # (N,) final body transpiration strengths
    sigma_wake: jnp.ndarray      # (Mw,) final wake transpiration strengths


def _station_fractions(m: int, dtype) -> jnp.ndarray:
    """Station spacing: clustered at the stagnation point only.

    Clustering at the TE as well turned out to be destabilising: the panel
    Vt carries slight wiggles on the sliver TE panels, and tiny TE steps
    amplify d(Ue dstar)/ds noise into transpiration spikes.
    """
    u = jnp.linspace(0.0, 1.0, m + 1, dtype=dtype)[1:]
    return u**1.6


# Station-resolution record (kept for the next calibration campaign): at
# alpha = 8 the suction-peak recovery (x ~ 0.02-0.06, where the laminar
# layer separates into a short bubble and the amplification field crosses
# n_crit) gets ~4-8 of the 96 power-law stations; a 192-uniform-station
# A/B shrank the associated 20-30% CD artifact to ~6%. An inviscid
# log-gradient-weighted ADAPTIVE grid at m=96 was built and measured
# (round 4/5): it shifted every calibrated transition basin (the
# amplification H-modulation, trip ceilings and separation boosts were
# all fit against this baseline grid) — 0012 CD +23..26% across the sweep
# and the all-laminar spurious basin reopened at Re=2e5 — so the
# machinery was REMOVED rather than shipped dormant (VERDICT r4 item 9);
# see git history (`_adaptive_fractions`) to resurrect it together with a
# closure recalibration.


def _find_stagnation(s_mid, vt, s_le):
    """Arc position of the Vt sign change (- on upper, + on lower side).

    Transpiration feedback can flip the sign of Vt on the unreliable sliver
    panels at a sharp TE, so rather than taking the *first* negative->positive
    crossing, the crossing nearest the leading edge (arc position ``s_le``)
    is selected — the physical stagnation point always lives there for the
    service's alpha envelope (reference main.py:44-45: -10..+20 deg).
    """
    n = vt.shape[0]
    crossing = jnp.concatenate([
        jnp.zeros((1,), bool),
        jnp.logical_and(vt[:-1] < 0.0, vt[1:] >= 0.0),
    ])
    dist = jnp.abs(s_mid - s_le) + jnp.where(crossing, 0.0, 1e6)
    j = jnp.clip(jnp.argmin(dist), 1, n - 1)
    v0 = vt[j - 1]
    v1 = vt[j]
    frac = jnp.clip(-v0 / jnp.where(jnp.abs(v1 - v0) < 1e-12, 1e-12, v1 - v0),
                    0.0, 1.0)
    return s_mid[j - 1] + frac * (s_mid[j] - s_mid[j - 1])


def _sample_side(s_mid, values, s_query):
    return jnp.interp(s_query, s_mid, values)


# Edge-velocity queries stop this fraction of the side's arc length short of
# the trailing edge. At a finite-angle TE the inviscid surface speed dives
# toward the corner stagnation over the last ~1% of arc — a sub-boundary-
# layer-scale feature the outer flow at the BL edge never imposes on the
# layer. Sampling it feeds an O(0.1) spurious deceleration into the last
# stations, and because d(theta) responds as exp((2+H)|dln ue|) the TE
# momentum thickness (hence the Squire-Young CD) inflates ~20-30% on
# closed-TE sections. XFOIL's nodal-vorticity discretisation has the same
# regularisation built in: its TE edge velocity is the Kutta-constrained
# node value, and the corner limit between the last node and the corner is
# deliberately unresolved (the reference drives that solver at
# main.py:362-366). Cusped TEs have no corner stagnation, so the clamp is a
# no-op there beyond freezing the last ~1% of a smooth ue.
_TE_UE_MARGIN = 0.01


def _side_stations(pan, vt, s0, upper: bool, m: int):
    """Station grid (arc xi from stagnation), Ue, x, y for one side.

    The first and last panel midpoints (the sharp-TE sliver panels, whose
    Vt is least reliable) are excluded from the interpolation stencil, and
    the ue queries are clamped ``_TE_UE_MARGIN`` short of the TE (see
    above). The returned query positions carry the clamp so the Newton
    system's interaction law samples identically; station x/y positions are
    NOT clamped — the grid itself still spans to the TE.
    """
    dtype = vt.dtype
    s_mid = 0.5 * (pan.s[:-1] + pan.s[1:])
    s_in = s_mid[1:-1]
    vt_in = vt[1:-1]
    if upper:
        length = s0 - pan.s[0]
        frac = _station_fractions(m, dtype)
        xi = frac * length
        s_q = s0 - xi
        s_q_ue = jnp.maximum(s_q, pan.s[0] + _TE_UE_MARGIN * length)
        ue = -_sample_side(s_in, vt_in, s_q_ue)
    else:
        length = pan.s[-1] - s0
        frac = _station_fractions(m, dtype)
        xi = frac * length
        s_q = s0 + xi
        s_q_ue = jnp.minimum(s_q, pan.s[-1] - _TE_UE_MARGIN * length)
        ue = _sample_side(s_in, vt_in, s_q_ue)
    ue = jnp.maximum(ue, 0.02)
    x = _sample_side(s_mid, pan.xm, s_q)
    y = _sample_side(s_mid, pan.ym, s_q)
    return xi, s_q_ue, ue, x, y


def _smooth_clip_derivative(xi, mval, clip=2.0):
    """d(m)/d(xi) with light smoothing — the derivative amplifies station
    noise, and the direct coupling iteration is only neutrally stable
    against short-wave sigma modes."""
    d = jnp.gradient(mval) / jnp.maximum(jnp.gradient(xi), 1e-9)
    for _ in range(2):
        d = jnp.concatenate([
            d[:1],
            0.25 * d[:-2] + 0.5 * d[1:-1] + 0.25 * d[2:],
            d[-1:],
        ])
    return jnp.clip(d, -clip, clip)


def _sigma_from_sides(pan, s0, xi_u, m_u, xi_l, m_l):
    """Map per-side mass defect m = Ue*dstar to panel source strengths.

    Smoothed-gradient variant, used by the DIRECT under-relaxed iteration
    only: that fixed-point loop is merely neutrally stable against
    short-wave sigma modes and needs the damping. The simultaneous Newton
    system uses the sharp panel-consistent ``_sigma_nodal_from_sides``.
    """
    sig_u = _smooth_clip_derivative(xi_u, m_u)
    sig_l = _smooth_clip_derivative(xi_l, m_l)
    s_mid = 0.5 * (pan.s[:-1] + pan.s[1:])
    xi_panel_u = jnp.clip(s0 - s_mid, 0.0, None)
    xi_panel_l = jnp.clip(s_mid - s0, 0.0, None)
    sigma = jnp.where(
        s_mid < s0,
        jnp.interp(xi_panel_u, xi_u, sig_u),
        jnp.interp(xi_panel_l, xi_l, sig_l),
    )
    return sigma


def _sigma_nodal_from_sides(pan, s0, xi_u, m_u, xi_l, m_l, clip=2.0):
    """Panel-consistent transpiration sources (XFOIL-style, no smoothing).

    The station mass-defect profiles m(xi) are interpolated to the PANEL
    NODES (anchored at m(0) = 0 at the stagnation point) and each panel's
    source strength is the flow-directed difference quotient
    (m_downstream - m_upstream) / ds — a piecewise-constant source sheet
    whose per-panel integral equals the mass-defect increment EXACTLY.
    This replaces the smoothed centered-gradient + midpoint-interp chain
    for the Newton interaction law: the smoothing diffused the rear
    displacement feedback over ~5% chord, which biased CD high at low
    alpha (the TE recovery was under-relieved) and under-decambered the
    separated TE region at high alpha (no CL rollover) — the two gaps
    share this root (STATUS round-2 measured leads). The panel straddling
    the stagnation point emits both sides' outflow. Linear in (m_u, m_l)
    modulo the rarely-active clip, so the structured-Jacobian
    factorisation in the Newton solve stays exact.
    """
    dtype = m_u.dtype
    zero = jnp.zeros((1,), dtype)
    xi_u0 = jnp.concatenate([zero, xi_u])
    mu0 = jnp.concatenate([zero, m_u])
    xi_l0 = jnp.concatenate([zero, xi_l])
    ml0 = jnp.concatenate([zero, m_l])
    s_nodes = pan.s
    m_up = jnp.interp(jnp.clip(s0 - s_nodes, 0.0, None), xi_u0, mu0)
    m_lo = jnp.interp(jnp.clip(s_nodes - s0, 0.0, None), xi_l0, ml0)
    m_nodes = jnp.where(s_nodes < s0, m_up, m_lo)
    ds = jnp.maximum(s_nodes[1:] - s_nodes[:-1], 1e-9)
    dm = m_nodes[1:] - m_nodes[:-1]
    fully_upper = s_nodes[1:] <= s0
    fully_lower = s_nodes[:-1] >= s0
    # Arc runs TE -> LE -> TE, so on the upper side the flow direction is
    # -s: sigma = -dm/ds there, +dm/ds on the lower side.
    sigma = jnp.where(
        fully_upper, -dm / ds,
        jnp.where(fully_lower, dm / ds,
                  (m_nodes[:-1] + m_nodes[1:]) / ds))
    return jnp.clip(sigma, -clip, clip)


def _sigma_wake_nodal(wpan, xi_w, m_w, m_te, clip=2.0):
    """Panel-consistent wake sources: nodal mass defect differenced per
    wake panel, anchored at the TE with the merged body mass defect
    ``m_te`` (so the strong near-TE relaxation of the wake's H appears at
    full strength in the first wake panels instead of being smoothed
    away). Linear in (m_w, m_te) modulo the clip."""
    s_rel = wpan.s - wpan.s[0]
    xi0 = jnp.concatenate([jnp.zeros((1,), m_w.dtype), xi_w])
    m0 = jnp.concatenate([jnp.reshape(m_te, (1,)), m_w])
    m_nodes = jnp.interp(s_rel, xi0, m0)
    ds = jnp.maximum(s_rel[1:] - s_rel[:-1], 1e-9)
    return jnp.clip((m_nodes[1:] - m_nodes[:-1]) / ds, -clip, clip)


def _forces_from_cp(pan, cp, alpha_deg):
    """Integrate surface Cp to (cl, cm, cd_pressure)."""
    ds = pan.length
    fx = jnp.sum(cp * pan.nx * ds)
    fy = jnp.sum(cp * pan.ny * ds)
    ca, sa = _freestream(alpha_deg)
    cl = fy * ca - fx * sa
    cdp = fx * ca + fy * sa
    cm = -jnp.sum(
        cp * ds * ((pan.xm - 0.25) * pan.ny - pan.ym * pan.nx)
    )
    return cl, cm, cdp


@partial(jax.jit, static_argnames=("n_stations", "n_wake", "coupling_iters"))
def solve_viscous(
    op: InviscidOperator,
    alpha_deg: jnp.ndarray,
    reynolds: jnp.ndarray,
    n_crit: float = 9.0,
    x_forced_transition: float = 1.0,
    n_stations: int = 80,
    n_wake: int = 24,
    coupling_iters: int = 24,
    relax: float = 0.3,
) -> ViscousResult:
    """Coupled viscous solve at one (alpha, Re). vmap over either or both."""
    pan = op.pan
    nu = 1.0 / reynolds
    dtype = pan.xm.dtype

    sol0 = solve_inviscid(op, alpha_deg)
    vt0 = sol0.vt
    n = vt0.shape[0]
    m = n_stations

    wop: WakeOperator = build_wake_operator(op, alpha_deg, n_wake=n_wake)
    te_gap = jnp.hypot(pan.xp[0] - pan.xp[-1], pan.yp[0] - pan.yp[-1])

    s_le = pan.s[jnp.argmin(pan.xp)]
    s_mid = 0.5 * (pan.s[:-1] + pan.s[1:])

    # The two surface marches are independent given Vt; vmapping them into
    # one (2, M) batch halves the sequential op count of each coupling pass
    # (the solve is dispatch-latency-bound, not FLOP-bound).
    march_pair = jax.vmap(
        lambda s, ue, x: march_side(s, ue, x, nu, n_crit,
                                    x_forced_transition))

    def march_all(sigma_b, sigma_w):
        vt = vt0 + op.due_dsigma @ sigma_b + wop.dvt_dsigw @ sigma_w
        s0 = _find_stagnation(s_mid, vt, s_le)
        xi_u, _sq, ue_u, x_u, y_u = _side_stations(pan, vt, s0, True, m)
        xi_l, _sq, ue_l, x_l, y_l = _side_stations(pan, vt, s0, False, m)
        bl2: BLState = march_pair(
            jnp.stack([xi_u, xi_l]),
            jnp.stack([ue_u, ue_l]),
            jnp.stack([x_u, x_l]))
        bl_u = jax.tree.map(lambda a: a[0], bl2)
        bl_l = jax.tree.map(lambda a: a[1], bl2)

        ue_w = wop.uw0 + wop.wb @ sigma_b + wop.ww @ sigma_w
        ue_w = jnp.maximum(blend_te_continuity(
            wop.xi, ue_w, 0.5 * (ue_u[-1] + ue_l[-1])), 0.05)
        th0 = bl_u.theta[-1] + bl_l.theta[-1]
        ds0 = bl_u.dstar[-1] + bl_l.dstar[-1] + te_gap

        ct0 = wake_ctau0(bl_u, bl_l, th0, ds0,
                         0.5 * (ue_u[-1] + ue_l[-1]), nu)
        th_w, ds_w, hk_w = march_wake(wop.xi, ue_w, nu, th0, ds0, ct0)

        return vt, s0, (xi_u, ue_u, x_u, y_u, bl_u), \
            (xi_l, ue_l, x_l, y_l, bl_l), (ue_w, th_w, ds_w, hk_w)

    # The direct under-relaxed iteration settles into a small limit cycle
    # (pumped by station-quantised transition movement) around the true
    # fixed point rather than converging to it; averaging the iterates over
    # the tail of the loop extracts the cycle centre. Convergence is judged
    # by the CL spread across the averaging window — the batched analog of
    # XFOIL's "VISCAL: Convergence failed" (reference main.py:441-447).
    avg_from = coupling_iters // 3

    def body(carry, it):
        sigma_b, sigma_w, acc_b, acc_w = carry
        vt, s0, up, lo, wake = march_all(sigma_b, sigma_w)
        xi_u, ue_u, _xu, _yu, bl_u = up
        xi_l, ue_l, _xl, _yl, bl_l = lo
        ue_w, th_w, ds_w, _hk_w = wake

        sb_new = _sigma_from_sides(
            pan, s0, xi_u, ue_u * bl_u.dstar, xi_l, ue_l * bl_l.dstar
        )
        sw_new = _smooth_clip_derivative(wop.xi, ue_w * ds_w)
        sb_new = jnp.where(jnp.isfinite(sb_new), sb_new, sigma_b)
        sw_new = jnp.where(jnp.isfinite(sw_new), sw_new, sigma_w)

        sigma_b = sigma_b + relax * (sb_new - sigma_b)
        sigma_w = sigma_w + relax * (sw_new - sigma_w)

        in_window = (it >= avg_from).astype(dtype)
        acc_b = acc_b + in_window * sigma_b
        acc_w = acc_w + in_window * sigma_w

        vt_now = (vt0 + op.due_dsigma @ sigma_b + wop.dvt_dsigw @ sigma_w)
        cl, _cm, _cdp = _forces_from_cp(pan, 1.0 - vt_now**2, alpha_deg)
        cl = jnp.where(in_window > 0, cl, jnp.nan)
        return (sigma_b, sigma_w, acc_b, acc_w), cl

    init = (jnp.zeros((n,), dtype), jnp.zeros((n_wake,), dtype),
            jnp.zeros((n,), dtype), jnp.zeros((n_wake,), dtype))
    (_, _, acc_b, acc_w), cl_hist = jax.lax.scan(
        body, init, jnp.arange(coupling_iters)
    )
    n_avg = coupling_iters - avg_from
    sigma_b = acc_b / n_avg
    sigma_w = acc_w / n_avg
    cl_window = cl_hist[avg_from:]
    cl_spread = jnp.nanmax(cl_window) - jnp.nanmin(cl_window)

    # Final state at the settled transpiration.
    vt, s0, up, lo, wake = march_all(sigma_b, sigma_w)
    xi_u, ue_u, x_u, y_u, bl_u = up
    xi_l, ue_l, x_l, y_l, bl_l = lo
    ue_w, th_w, ds_w, hk_w = wake

    cp = 1.0 - vt * vt
    cl, cm, cdp_raw = _forces_from_cp(pan, cp, alpha_deg)

    # Squire-Young extrapolation from the wake end (H there is already
    # close to 1, making the formula's exponent benign).
    h_end = jnp.clip(hk_w[-1], 1.0, 2.5)
    ue_end = jnp.clip(ue_w[-1], 0.2, 1.5)
    cd = 2.0 * th_w[-1] * ue_end ** (0.5 * (h_end + 5.0))

    def friction_drag(bl: BLState, ue, x):
        integrand = bl.cf * ue**2
        return jnp.sum(
            0.5 * (integrand[1:] + integrand[:-1]) * jnp.abs(jnp.diff(x))
        )

    cdf = friction_drag(bl_u, ue_u, x_u) + friction_drag(bl_l, ue_l, x_l)
    cdp = cd - cdf

    sep_u = jnp.mean(bl_u.separated.astype(dtype))
    sep_l = jnp.mean(bl_l.separated.astype(dtype))
    sep_fraction = 0.5 * (sep_u + sep_l)

    finite = (jnp.all(jnp.isfinite(sigma_b)) & jnp.all(jnp.isfinite(sigma_w))
              & jnp.isfinite(cl) & jnp.isfinite(cd))
    settled = cl_spread < 0.12
    mild_sep = sep_fraction < 0.12
    converged = finite & settled & mild_sep

    def side(bl: BLState, xi, ue, x, y) -> SideBL:
        return SideBL(x=x, y=y, s=xi, ue=ue, theta=bl.theta,
                      dstar=bl.dstar, hk=bl.hk, cf=bl.cf, turb=bl.turb,
                      x_transition=bl.x_transition)

    return ViscousResult(
        cl=cl, cd=cd, cdp=cdp, cm=cm, cp=cp,
        upper=side(bl_u, xi_u, ue_u, x_u, y_u),
        lower=side(bl_l, xi_l, ue_l, x_l, y_l),
        converged=converged, sep_fraction=sep_fraction,
        sigma=sigma_b, sigma_wake=sigma_w,
    )
