"""Integral boundary-layer march (one surface side).

Replaces the boundary-layer half of the XFOIL binary the reference shells out
to (reference main.py:392-399, ``VISC``/``ITER`` script lines at
main.py:362-364). The march integrates the von Karman momentum equation and
the kinetic-energy shape-parameter equation from the stagnation point to the
trailing edge with:

- Falkner-Skan stagnation-flow initial conditions,
- the e^N envelope amplification equation for free transition
  (the reference only *detects* transition post-hoc from Cf jumps,
  main.py:257-270 — here it is predicted),
- Drela's lag equation for the turbulent shear-stress coefficient,
- an implicit trapezoidal step solved by a fixed-iteration damped Newton
  (3x3 per station) so the whole march is one ``lax.scan`` — static shapes,
  no data-dependent control flow, fully ``vmap``-able over (alpha, Re).

Direct-mode separation (the Goldstein singularity) is stepped over by
capping the kinematic shape parameter; stations where the cap engages are
flagged and surface the ``converged=False`` signal that drives the service's
three-strategy fallback (reference main.py:284-325).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from airfoil_tpu.viscous import closures as cl

__all__ = ["BLState", "stagnation_ic", "march_side", "wake_ctau0"]

_NEWTON_ITERS = 8
_CTAU_INIT_FACTOR = 0.7
_KLAG = 5.6
# Implicit weighting of interval averages: 0.5 = trapezoidal (oscillatory on
# clustered stations, Crank-Nicolson wiggle), 1.0 = backward Euler. 0.7
# damps the wiggle at ~1% accuracy cost on the Blasius anchor.
_AVG_W = 0.7


def _avg(f1, f2):
    return (1.0 - _AVG_W) * f1 + _AVG_W * f2


class BLState(NamedTuple):
    """Per-station boundary-layer arrays along one side (stag -> TE)."""

    theta: jnp.ndarray    # momentum thickness
    dstar: jnp.ndarray    # displacement thickness
    hk: jnp.ndarray       # kinematic shape parameter
    cf: jnp.ndarray       # skin-friction coefficient (edge-q normalised)
    amp: jnp.ndarray      # e^N amplification factor (laminar region)
    ctau: jnp.ndarray     # shear-stress coefficient (turbulent region)
    turb: jnp.ndarray     # bool: station is turbulent
    separated: jnp.ndarray  # bool: Hk cap engaged at this station
    x_transition: jnp.ndarray  # scalar: chordwise transition location


def stagnation_ic(s1, ue1, nu):
    """Falkner-Skan stagnation-point initial condition.

    For Hiemenz flow Ue = K s the similarity solution gives
    theta = sqrt(0.075 nu / K) with H ~ 2.24; K is estimated from the first
    station off the stagnation point.
    """
    k = jnp.maximum(ue1 / jnp.maximum(s1, 1e-8), 1e-6)
    theta0 = jnp.sqrt(0.075 * nu / k)
    h0 = 2.24
    return theta0, h0 * theta0


def _regime_quantities(theta, dstar, ue, nu, ctau, turb, wake=False):
    """Closure evaluations blended by regime flag.

    In wake mode there is no wall: Cf = 0 and dissipation comes from the
    shear-stress term alone (the reference's XFOIL binary does the same in
    its wake treatment).
    """
    theta = jnp.maximum(theta, 1e-10)
    hk = jnp.clip(dstar / theta, 1.02, 12.0)
    ret = jnp.maximum(ue * theta / nu, 1.0)

    hs_l = cl.lam_hstar(hk)
    hs_t = cl.turb_hstar(hk, ret)
    hs = jnp.where(turb, hs_t, hs_l)

    cf_l = cl.lam_cf(hk, ret)
    cf_t = cl.turb_cf(hk, ret)
    cf = jnp.where(turb, cf_t, cf_l)

    cd_l = cl.lam_diss(hk, ret, hs_l)
    cd_t = cl.turb_diss(hk, ret, ctau, hs_t)
    cd = jnp.where(turb, cd_t, cd_l)

    if wake:
        cf = jnp.zeros_like(cf)
        us = cl.turb_us(hk, hs_t)
        cd = jnp.clip(ctau, 0.0, 0.3) * (1.0 - us)

    return hk, ret, hs, cf, cd


def _step_residual(z2, carry1, st1, st2, nu, turb, wake=False):
    """Implicit-weighted residual for one interval; z2 = (ln t2, ln d2, a2)."""
    s1, ue1, _x1 = st1
    s2, ue2, _x2 = st2
    t1, d1, a1 = carry1
    t2 = jnp.exp(z2[0])
    d2 = jnp.exp(z2[1])
    a2 = z2[2]

    ds = jnp.maximum(s2 - s1, 1e-8)
    due = ue2 - ue1
    ue_m = _avg(ue1, ue2)
    t_m = _avg(t1, t2)

    ctau1 = jnp.exp(jnp.clip(a1, -20.0, 0.0))
    ctau2 = jnp.exp(jnp.clip(a2, -20.0, 0.0))
    hk1, ret1, hs1, cf1, cd1 = _regime_quantities(t1, d1, ue1, nu, ctau1, turb, wake)
    hk2, ret2, hs2, cf2, cd2 = _regime_quantities(t2, d2, ue2, nu, ctau2, turb, wake)

    h_m = _avg(hk1, hk2)
    hs_m = _avg(hs1, hs2)
    cf_m = _avg(cf1, cf2)
    cd_m = _avg(cd1, cd2)

    # von Karman momentum integral
    r1 = (t2 - t1) / ds + (2.0 + h_m) * (t_m / ue_m) * (due / ds) - 0.5 * cf_m
    # kinetic-energy shape parameter equation
    r2 = (t_m * (hs2 - hs1) / ds
          + hs_m * (1.0 - h_m) * (t_m / ue_m) * (due / ds)
          - (2.0 * cd_m - hs_m * 0.5 * cf_m))

    # Amplification (laminar) / shear-stress lag (turbulent)
    rate1 = cl.amplification_rate(hk1, t1, ret1)
    rate2 = cl.amplification_rate(hk2, t2, ret2)
    r3_lam = (a2 - a1) / ds - _avg(rate1, rate2)

    cteq1 = cl.turb_cteq(hk1, ret1, hs1)
    cteq2 = cl.turb_cteq(hk2, ret2, hs2)
    del1 = cl.delta_thickness(t1, d1, hk1)
    del2 = cl.delta_thickness(t2, d2, hk2)
    lag1 = _KLAG * (jnp.sqrt(cteq1) - jnp.sqrt(ctau1)) / (2.0 * del1)
    lag2 = _KLAG * (jnp.sqrt(cteq2) - jnp.sqrt(ctau2)) / (2.0 * del2)
    r3_turb = (a2 - a1) / ds - _avg(lag1, lag2)

    r3 = jnp.where(turb, r3_turb, r3_lam)
    # Scale residuals to comparable magnitude (theta is tiny).
    return jnp.stack([r1 / jnp.maximum(t_m, 1e-10) * ds,
                      r2 / jnp.maximum(t_m, 1e-10) * ds,
                      r3 * jnp.where(turb, 1.0, ds)])


def march_side(
    s: jnp.ndarray,
    ue: jnp.ndarray,
    x: jnp.ndarray,
    nu: jnp.ndarray,
    n_crit: float = 9.0,
    x_forced_transition: float = 1.0,
) -> BLState:
    """March the integral BL over one side's stations (stag -> TE).

    ``s``: (M,) arc distance from the stagnation point (s[0] small, not 0).
    ``ue``: (M,) positive edge velocities / U_inf. ``x``: (M,) chordwise
    positions for transition bookkeeping. ``nu`` = 1/Re (chord units).
    """
    m = s.shape[0]
    theta0, dstar0 = stagnation_ic(s[0], ue[0], nu)

    # Trip coordinate: chordwise x masked to -1 BEFORE the leading edge.
    # The strip's x wraps around the LE (stagnation sits on the opposite
    # surface at nonzero alpha, e.g. x_stag ~ 0.04 on the lower side at
    # alpha = 12), so a bare ``x >= x_forced_transition`` test fires AT
    # THE STAGNATION POINT whenever the trip x is small enough — the
    # march then runs turbulent from station 0, ~30% thicker everywhere,
    # which silently broke every near-LE forced-trip run at high alpha
    # (and through it the march-oracle convergence gate).
    x_trip_c = jnp.where(jnp.arange(m) >= jnp.argmin(x), x,
                         jnp.full_like(x, -1.0))

    def scan_step(carry, inp):
        t1, d1, a1, turb1, xtr, tripped, lam_sep1, seprun1 = carry
        s1, ue1, x1, xt1, s2, ue2, x2 = inp

        # Transition trigger at interval start: free (amplification), trip,
        # or a laminar separation that has run 0.05c without the envelope
        # crossing n_crit. The last is the classical separation-forced
        # transition (XFOIL's reported transition points sit AT the
        # laminar-separation location when e^N has not fired — e.g. the
        # lower-surface aft values 0.93/0.85 in its 0012/2412 polars): a
        # separated laminar shear layer is inviscidly unstable and cannot
        # persist; without this cap the march carries a pinned-Hk
        # separated layer to the TE whose inflated displacement thickness
        # fakes an extra ~+0.04 of camber-lift.
        amp_hit = jnp.logical_and(jnp.logical_not(turb1), a1 >= n_crit)
        trip_hit = jnp.logical_and(jnp.logical_not(turb1),
                                   xt1 >= x_forced_transition)
        sep_hit = jnp.logical_and(jnp.logical_not(turb1), seprun1 > 0.05)
        becomes_turb = jnp.logical_or(jnp.logical_or(amp_hit, trip_hit),
                                      sep_hit)
        turb2 = jnp.logical_or(turb1, becomes_turb)

        # Record transition x once (interpolate the n~ = n_crit crossing).
        xtr_new = jnp.where(
            jnp.logical_and(becomes_turb, jnp.logical_not(tripped)),
            x1, xtr)
        tripped2 = jnp.logical_or(tripped, becomes_turb)

        # Transition treatment: momentum thickness is continuous; the shape
        # parameter is reset toward the attached turbulent value. Carrying
        # the laminar (often separated, Hk ~ 4-5) displacement thickness
        # into the turbulent closures lands on the upper branch of the
        # non-monotone turbulent H*(Hk) correlation, where the march pins at
        # the Hk cap instead of reattaching. The reset is the classical
        # integral-method treatment (it forfeits explicit bubble drag; XFOIL
        # resolves the bubble through its simultaneous Newton system).
        hk_reset = 1.55
        d1 = jnp.where(becomes_turb,
                       jnp.minimum(d1, hk_reset * t1), d1)
        hk1 = jnp.clip(d1 / jnp.maximum(t1, 1e-10), 1.02, 12.0)
        ret1 = jnp.maximum(ue1 * t1 / nu, 1.0)
        hs1 = cl.turb_hstar(hk1, ret1)
        cteq1 = cl.turb_cteq(hk1, ret1, hs1)
        a1 = jnp.where(becomes_turb,
                       jnp.log(_CTAU_INIT_FACTOR * cteq1), a1)

        st1 = (s1, ue1, x1)
        st2 = (s2, ue2, x2)
        carry1 = (t1, d1, a1)

        # Initial guess: carry forward.
        z = jnp.stack([jnp.log(jnp.maximum(t1, 1e-10)),
                       jnp.log(jnp.maximum(d1, 1e-10)),
                       a1])

        def newton(z, _):
            r = _step_residual(z, carry1, st1, st2, nu, turb2)
            jac = jax.jacfwd(_step_residual)(z, carry1, st1, st2, nu, turb2)
            jac = jac + 1e-8 * jnp.eye(3, dtype=z.dtype)
            dz = jnp.linalg.solve(jac, -r)
            dz = jnp.clip(dz, -0.5, 0.5)
            bad = jnp.logical_not(jnp.all(jnp.isfinite(dz)))
            dz = jnp.where(bad, jnp.zeros_like(dz), dz)
            return z + dz, None

        z, _ = jax.lax.scan(newton, z, None, length=_NEWTON_ITERS)

        # Per-step growth clamp: theta/dstar may at most double per station.
        # Physical marches never need more; unconverged Newton excursions
        # (e.g. the sharp-TE inviscid recompression before the transpiration
        # feedback has softened it) would otherwise run away.
        z0 = jnp.clip(z[0], jnp.log(jnp.maximum(t1, 1e-10)) - 0.7,
                      jnp.log(jnp.maximum(t1, 1e-10)) + 0.7)
        z1 = jnp.clip(z[1], jnp.log(jnp.maximum(d1, 1e-10)) - 0.7,
                      jnp.log(jnp.maximum(d1, 1e-10)) + 0.7)
        t2 = jnp.exp(jnp.clip(z0, -23.0, 0.0))
        d2 = jnp.exp(jnp.clip(z1, -23.0, 1.0))
        a2 = jnp.clip(z[2], a1 - 3.0, a1 + 3.0)

        # Cap Hk to step over the direct-mode separation singularity.
        hk_cap = jnp.where(turb2, cl.HK_TURB_MAX, cl.HK_LAM_MAX)
        hk2_raw = d2 / jnp.maximum(t2, 1e-10)
        sep = hk2_raw > hk_cap
        d2 = jnp.where(sep, hk_cap * t2, d2)
        # Sticky laminar separation: a separated laminar shear layer does
        # not reattach before transition. Without the pin the next
        # station's Newton can fall back onto an attached laminar root and
        # the march oscillates around the separation point; the envelope
        # integral then creeps and short-bubble transition (the
        # low-Reynolds regime, e.g. Re ~ 2e5) never fires. Pinning Hk at
        # the cap keeps the separated-shear amplification rate active, so
        # n crosses n_crit within a few percent chord of separation — the
        # classical short-bubble transition criterion.
        # Trigger at the physical laminar-separation shape factor (Cf
        # crosses zero near Hk ~ 4.0 in the Falkner-Skan fit), not at the
        # numerical cap — the oscillating march may never reach the cap.
        lam_sep_now = jnp.logical_and(jnp.logical_not(turb2),
                                      hk2_raw > 4.05)
        lam_sep2 = jnp.logical_and(jnp.logical_not(turb2),
                                   jnp.logical_or(lam_sep1, lam_sep_now))
        d2 = jnp.where(lam_sep2,
                       jnp.maximum(d2, cl.HK_LAM_MAX * t2), d2)
        sep = jnp.logical_or(sep, lam_sep2)
        a2 = jnp.where(turb2, jnp.clip(a2, -18.0, -1.0),
                       jnp.clip(a2, 0.0, 30.0))
        # Laminar amplification is integrated EXPLICITLY from the solved
        # thickness states: the rate does not depend on n, so the explicit
        # trapezoid is exact for this equation — and the per-station 3x3
        # Newton is ill-conditioned near the stagnation point (microscopic
        # theta) where it otherwise leaks clip-bounded garbage into `a`,
        # seeding transition ~2x early in Re_x on a flat plate.
        hk1_est = jnp.clip(d1 / jnp.maximum(t1, 1e-10), 1.02, 12.0)
        ret1_est = jnp.maximum(ue1 * t1 / nu, 1.0)
        hk2_est = jnp.clip(d2 / jnp.maximum(t2, 1e-10), 1.02, 12.0)
        ret2_est = jnp.maximum(ue2 * t2 / nu, 1.0)
        rate_lam = _avg(cl.amplification_rate(hk1_est, t1, ret1_est),
                        cl.amplification_rate(hk2_est, t2, ret2_est))
        ds12 = jnp.maximum(s2 - s1, 1e-8)
        a2 = jnp.where(turb2, a2,
                       jnp.clip(a1 + ds12 * rate_lam, 0.0, 30.0))

        # Outputs at station 2.
        ctau2 = jnp.exp(jnp.clip(a2, -20.0, 0.0))
        hk2, ret2, hs2, cf2, _cd2 = _regime_quantities(
            t2, d2, ue2, nu, ctau2, turb2)

        # Chordwise run length of the current laminar-separated stretch.
        seprun2 = jnp.where(lam_sep2, seprun1 + jnp.abs(x2 - x1),
                            jnp.zeros_like(seprun1))

        out = (t2, d2, hk2, cf2,
               jnp.where(turb2, jnp.nan, a2),
               jnp.where(turb2, ctau2, jnp.nan),
               turb2, sep)
        return (t2, d2, a2, turb2, xtr_new, tripped2, lam_sep2,
                seprun2), out

    inputs = (s[:-1], ue[:-1], x[:-1], x_trip_c[:-1], s[1:], ue[1:], x[1:])
    init = (theta0, dstar0, jnp.zeros_like(theta0),
            jnp.array(False), jnp.asarray(x[-1], s.dtype), jnp.array(False),
            jnp.array(False), jnp.zeros_like(theta0))
    (tf, df, af, turbf, xtr, _, _, _), outs = jax.lax.scan(
        scan_step, init, inputs)

    theta_a, dstar_a, hk_a, cf_a, amp_a, ctau_a, turb_a, sep_a = outs

    # Prepend the stagnation station.
    hk0 = dstar0 / theta0
    ret0 = jnp.maximum(ue[0] * theta0 / nu, 1.0)
    cf0 = cl.lam_cf(hk0, ret0)

    def cat(first, rest):
        return jnp.concatenate([jnp.reshape(first, (1,)), rest])

    return BLState(
        theta=cat(theta0, theta_a),
        dstar=cat(dstar0, dstar_a),
        hk=cat(hk0, hk_a),
        cf=cat(cf0, cf_a),
        amp=cat(jnp.zeros_like(theta0), amp_a),
        ctau=cat(jnp.nan * theta0, ctau_a),
        turb=cat(jnp.array(False), turb_a),
        separated=cat(jnp.array(False), sep_a),
        x_transition=xtr,
    )


def march_wake(
    s: jnp.ndarray,
    ue: jnp.ndarray,
    nu: jnp.ndarray,
    theta0: jnp.ndarray,
    dstar0: jnp.ndarray,
    ctau0: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """March the merged free wake downstream of the trailing edge.

    ``s`` is arc distance from the TE (s[0] small), ``ue`` the wake
    centerline edge velocity. Initial conditions come from the merged
    upper+lower TE boundary-layer states. Always turbulent-closure, Cf = 0,
    shear-driven dissipation only. Returns (theta, dstar, hk) arrays.
    """
    a0 = jnp.log(jnp.clip(ctau0, 1e-7, 0.3))
    hk_wake_cap = 10.0

    def scan_step(carry, inp):
        t1, d1, a1 = carry
        s1, ue1, s2, ue2 = inp
        st1 = (s1, ue1, s1)
        st2 = (s2, ue2, s2)
        carry1 = (t1, d1, a1)
        z = jnp.stack([jnp.log(jnp.maximum(t1, 1e-10)),
                       jnp.log(jnp.maximum(d1, 1e-10)), a1])
        turb = jnp.array(True)

        def newton(z, _):
            r = _step_residual(z, carry1, st1, st2, nu, turb, wake=True)
            jac = jax.jacfwd(_step_residual)(
                z, carry1, st1, st2, nu, turb, wake=True)
            jac = jac + 1e-8 * jnp.eye(3, dtype=z.dtype)
            dz = jnp.linalg.solve(jac, -r)
            dz = jnp.clip(dz, -0.5, 0.5)
            bad = jnp.logical_not(jnp.all(jnp.isfinite(dz)))
            dz = jnp.where(bad, jnp.zeros_like(dz), dz)
            return z + dz, None

        z, _ = jax.lax.scan(newton, z, None, length=_NEWTON_ITERS)
        z0 = jnp.clip(z[0], jnp.log(jnp.maximum(t1, 1e-10)) - 0.7,
                      jnp.log(jnp.maximum(t1, 1e-10)) + 0.7)
        z1 = jnp.clip(z[1], jnp.log(jnp.maximum(d1, 1e-10)) - 0.7,
                      jnp.log(jnp.maximum(d1, 1e-10)) + 0.7)
        t2 = jnp.exp(jnp.clip(z0, -23.0, 0.0))
        d2 = jnp.exp(jnp.clip(z1, -23.0, 1.0))
        a2 = jnp.clip(z[2], -18.0, -1.0)
        # Wake Hk floor is 1 (uniform profile); cap generously.
        hk2 = d2 / jnp.maximum(t2, 1e-10)
        d2 = jnp.where(hk2 > hk_wake_cap, hk_wake_cap * t2, d2)
        hk2 = jnp.clip(hk2, 1.0, hk_wake_cap)
        return (t2, d2, a2), (t2, d2, hk2)

    inputs = (s[:-1], ue[:-1], s[1:], ue[1:])
    (_, _, _), (theta_a, dstar_a, hk_a) = jax.lax.scan(
        scan_step, (theta0, dstar0, a0), inputs)

    def cat(first, rest):
        return jnp.concatenate([jnp.reshape(first, (1,)), rest])

    return (cat(theta0, theta_a), cat(dstar0, dstar_a),
            cat(dstar0 / jnp.maximum(theta0, 1e-10), hk_a))


def wake_ctau0(bl_u: BLState, bl_l: BLState, th0, ds0, ue_te, nu):
    """Initial wake shear-stress coefficient from the merged TE states.

    The theta-weighted mean of the two sides' TE ctau — but a side whose
    march arrives LAMINAR at the TE (e^N never fired; typically a
    laminar-separated stretch the separation-forced transition had no room
    to absorb) has no carried ctau, and substituting ~0 is what used to
    blow the wake up: with inlet hk = ds0/th0 ~ 4 and no shear stress the
    wake march has no dissipation to relax H, so H runs AWAY (theta
    collapses, Squire-Young CD halves — the round-3 direct-path CD=0.0027
    collapse at 0012@0@Re5e5). A separated/transitional free shear layer
    physically carries near-equilibrium Reynolds stress, so each laminar
    side contributes the equilibrium ctau at its own TE state scaled by
    XFOIL's transition-onset factor (its CTR = 1.8 exp(-3.3/(Hk-1))
    initialisation), and the merged value is additionally floored at
    0.7x the equilibrium ctau of the merged wake inlet state itself.
    """
    ret0 = jnp.maximum(ue_te * th0 / nu, 50.0)

    def side_ct(bl):
        hk_te = jnp.clip(bl.hk[-1], 1.05, 8.0)
        hs_te = cl.turb_hstar(hk_te, ret0)
        cteq = cl.turb_cteq(hk_te, ret0, hs_te)
        onset = 1.8 * jnp.exp(-3.3 / jnp.maximum(hk_te - 1.0, 0.2))
        lam_val = jnp.clip(onset, 0.2, 1.0) * cteq
        c = jnp.where(jnp.isnan(bl.ctau[-1]), lam_val, bl.ctau[-1])
        return jnp.clip(c, 1e-5, 0.3)

    ct0 = ((side_ct(bl_u) * bl_u.theta[-1] + side_ct(bl_l) * bl_l.theta[-1])
           / jnp.maximum(th0, 1e-10))
    hk0 = jnp.clip(ds0 / jnp.maximum(th0, 1e-10), 1.05, 8.0)
    hs0 = cl.turb_hstar(hk0, ret0)
    ct_floor = 0.7 * cl.turb_cteq(hk0, ret0, hs0)
    return jnp.clip(jnp.maximum(ct0, ct_floor), 1e-5, 0.3)
