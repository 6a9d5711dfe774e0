"""Viscous layer tests: closures vs exact similarity solutions, flat-plate
marches, and coupled-solve anchors vs published XFOIL-class values.

The coupled-solve tolerances are deliberately loose (10-20%): an integral
method with direct coupling is not XFOIL's simultaneous Newton system, and
the anchors themselves are approximate. The tight physics checks are the
flat-plate ones, where exact solutions exist.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airfoil_tpu.models import naca4
from airfoil_tpu.paneling import repanel, panel_geometry
from airfoil_tpu.inviscid import build_operator
from airfoil_tpu.viscous import march_side, solve_viscous
from airfoil_tpu.viscous import closures as cls
from airfoil_tpu.viscous.march import march_wake


class TestClosures:
    def test_blasius_hstar(self):
        # Blasius: Hk = 2.59, H* = 1.573
        assert abs(float(cls.lam_hstar(jnp.array(2.59))) - 1.573) < 0.005

    def test_blasius_cf(self):
        # Re_theta * Cf/2 = 0.2205 at Hk = 2.59
        ret = 1000.0
        cf = float(cls.lam_cf(jnp.array(2.59), jnp.array(ret)))
        assert abs(cf * ret / 2.0 - 0.2205) < 0.005

    def test_blasius_equilibrium_dissipation(self):
        # In Blasius flow 2 CD = H* Cf / 2 exactly (dH/ds = 0).
        hk = jnp.array(2.59)
        ret = jnp.array(1000.0)
        hs = cls.lam_hstar(hk)
        cf = cls.lam_cf(hk, ret)
        cd = cls.lam_diss(hk, ret, hs)
        assert abs(float(2 * cd - hs * cf / 2)) < 2e-5

    def test_turbulent_cf_magnitude(self):
        # Ludwieg-Tillmann at Hk=1.4, Re_theta=1e4 gives ~0.00234.
        cf = float(cls.turb_cf(jnp.array(1.4), jnp.array(1e4)))
        assert 0.0019 < cf < 0.0028

    def test_amplification_gated_below_critical(self):
        rate = cls.amplification_rate(
            jnp.array(2.3), jnp.array(1e-4), jnp.array(50.0))
        assert float(rate) < 1e-3


class TestFalknerSkan:
    """The laminar two-equation system must reproduce the Falkner-Skan
    similarity shape factors on ue = x^m power-law edge flows — the
    decisive check that adverse-gradient laminar H (which drives the e^N
    amplification rate) carries no closure bias."""

    # (beta, H) from standard similarity tables; beta = 2m/(m+1).
    ANCHORS = [(0.0, 2.591), (-0.05, 2.676), (-0.10, 2.801),
               (-0.14, 2.963)]

    @pytest.mark.parametrize("beta,h_ref", ANCHORS)
    def test_equilibrium_shape_factor(self, beta, h_ref):
        n = 256
        x = jnp.linspace(1e-3, 1.0, n)
        m = beta / (2.0 - beta)
        ue = x**m
        bl = march_side(x, ue, x, 1.0 / 5e5, 1e9, 2.0)  # no transition
        hk = np.asarray(bl.dstar) / np.maximum(np.asarray(bl.theta), 1e-12)
        h_mid = float(np.median(hk[n // 3: 2 * n // 3]))
        assert abs(h_mid - h_ref) / h_ref < 0.01


class TestFlatPlate:
    def _march(self, re, n_crit=30.0, xtrip=1.0):
        nu = 1.0 / re
        s = jnp.linspace(0.004, 1.0, 120)
        return march_side(s, jnp.ones(120), s, nu, n_crit, xtrip)

    def test_laminar_blasius_theta(self):
        bl = self._march(1e6)
        theta_exact = 0.664 / np.sqrt(1e6)
        assert abs(float(bl.theta[-1]) - theta_exact) / theta_exact < 0.02
        assert abs(float(bl.hk[-1]) - 2.59) < 0.02

    def test_turbulent_cf(self):
        bl = self._march(1e6, n_crit=9.0, xtrip=0.05)
        # 1/7th-power-law estimate: cf ~ 0.0592 Re_x^-0.2 = 0.0037 at x=1
        assert 0.0028 < float(bl.cf[-1]) < 0.0046
        assert 1.25 < float(bl.hk[-1]) < 1.55

    def test_free_transition_location(self):
        # e^N with n_crit=9 on a flat plate: the classical envelope answer
        # is Re_x ~ 2.6-3.5e6 (the march's explicit amplification
        # integration lands at ~3.0e6, Re-independent).
        for re in (6e6, 1e7):
            bl = self._march(re, n_crit=9.0)
            re_x_tr = re * float(bl.x_transition)
            assert 2.5e6 < re_x_tr < 3.6e6

    def test_no_transition_at_low_re(self):
        bl = self._march(2e5, n_crit=9.0)
        assert float(bl.x_transition) >= 0.99


class TestWakeMarch:
    def test_wake_relaxes_toward_uniform(self):
        s = jnp.linspace(0.01, 1.0, 40)
        t, d, h = march_wake(s, jnp.full(40, 0.9), 1e-6,
                             jnp.array(0.004), jnp.array(0.008),
                             jnp.array(0.002))
        assert float(h[-1]) < 1.3
        # Momentum theorem: theta conserved at constant Ue, no wall.
        np.testing.assert_allclose(float(t[-1]), 0.004, rtol=1e-3)


@pytest.fixture(scope="module")
def op2412():
    xp, yp = repanel(naca4(2, 4, 12, 100), 160)
    return build_operator(panel_geometry(xp, yp))


@pytest.fixture(scope="module")
def op0012():
    xp, yp = repanel(naca4(0, 0, 12, 100), 160)
    return build_operator(panel_geometry(xp, yp))


@pytest.mark.slow
class TestCoupledSolve:
    def test_naca2412_re1e6_alpha0(self, op2412):
        r = solve_viscous(op2412, 0.0, 1e6)
        assert bool(r.converged)
        assert abs(float(r.cl) - 0.24) < 0.04
        assert 0.0050 < float(r.cd) < 0.0080
        assert 0.45 < float(r.upper.x_transition) < 0.75

    def test_naca2412_re1e6_alpha5(self, op2412):
        r = solve_viscous(op2412, 5.0, 1e6)
        assert abs(float(r.cl) - 0.755) < 0.08
        assert 0.0050 < float(r.cd) < 0.0105
        assert 0.15 < float(r.upper.x_transition) < 0.45

    def test_viscous_cl_below_inviscid(self, op2412):
        from airfoil_tpu.inviscid import solve_inviscid
        inv = solve_inviscid(op2412, 5.0)
        vis = solve_viscous(op2412, 5.0, 1e6)
        assert float(vis.cl) < float(inv.cl)

    def test_symmetric_airfoil(self, op0012):
        rp = solve_viscous(op0012, 4.0, 1e6)
        rm = solve_viscous(op0012, -4.0, 1e6)
        assert abs(float(rp.cl) + float(rm.cl)) < 0.03
        r0 = solve_viscous(op0012, 0.0, 1e6)
        assert abs(float(r0.cl)) < 0.01
        assert 0.0045 < float(r0.cd) < 0.0080

    def test_reynolds_trend(self, op0012):
        # Drag decreases with Reynolds number (transition moves forward but
        # cf drops; net: XFOIL gives 0.0056 @1e6 vs 0.0046 @1e7 class values)
        cd_lo = float(solve_viscous(op0012, 0.0, 5e5).cd)
        cd_hi = float(solve_viscous(op0012, 0.0, 5e6).cd)
        assert cd_hi < cd_lo

    def test_stall_region_flags_nonconverged(self, op0012):
        r = solve_viscous(op0012, 16.0, 1e6)
        assert not bool(r.converged)

    def test_bl_data_shapes_and_sanity(self, op2412):
        r = solve_viscous(op2412, 5.0, 1e6)
        for side in (r.upper, r.lower):
            assert side.theta.shape == side.x.shape
            assert np.all(np.array(side.theta) > 0)
            assert np.all(np.array(side.dstar) >= np.array(side.theta) * 0.99)
        # Upper transition ahead of lower at positive alpha.
        assert float(r.upper.x_transition) < float(r.lower.x_transition)

    def test_vmap_matches_scalar(self, op2412):
        alphas = jnp.array([0.0, 5.0])
        batched = jax.vmap(lambda a: solve_viscous(op2412, a, 1e6).cl)(alphas)
        for i, a in enumerate(alphas):
            scalar = solve_viscous(op2412, float(a), 1e6).cl
            # The coupling iteration settles into a limit cycle whose phase
            # is sensitive to f32 reduction order; the iterate-averaged CL
            # carries ~1-2% residual spread between execution paths.
            np.testing.assert_allclose(float(batched[i]), float(scalar),
                                       rtol=0, atol=0.025)

    def test_forced_transition(self, op0012):
        r = solve_viscous(op0012, 0.0, 1e6, x_forced_transition=0.1)
        assert float(r.upper.x_transition) < 0.2
        # Tripped flow has more turbulent run -> more drag.
        free = solve_viscous(op0012, 0.0, 1e6)
        assert float(r.cd) > float(free.cd)
