"""Numerical regression tests for the inviscid panel solver.

Anchor values are published panel-method / XFOIL-inviscid results:
NACA 0012 alpha=5 CL ~ 0.60, NACA 2412 alpha=0 CL ~ 0.26 / Cm ~ -0.055,
NACA 4412 alpha=0 CL ~ 0.52 / Cm ~ -0.11 (Abbott & von Doenhoff-class data;
the reference treats XFOIL as ground truth, SURVEY.md section 6).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airfoil_tpu.models import naca4
from airfoil_tpu.paneling import repanel, panel_geometry
from airfoil_tpu.inviscid import (
    build_operator,
    solve_inviscid,
    velocity_at_points,
)


def make_op(coords, n=160):
    xp, yp = repanel(coords, n)
    return build_operator(panel_geometry(xp, yp))


@pytest.fixture(scope="module")
def op0012():
    return make_op(naca4(0, 0, 12, 100))


@pytest.fixture(scope="module")
def op2412():
    return make_op(naca4(2, 4, 12, 100))


class TestAnchors:
    def test_naca0012_zero_alpha_zero_lift(self, op0012):
        sol = solve_inviscid(op0012, 0.0)
        assert abs(float(sol.cl)) < 5e-3
        assert abs(float(sol.cm)) < 2e-3

    def test_naca0012_cl_at_5deg(self, op0012):
        sol = solve_inviscid(op0012, 5.0)
        assert abs(float(sol.cl) - 0.60) < 0.02

    def test_naca2412_cl_cm_at_0deg(self, op2412):
        sol = solve_inviscid(op2412, 0.0)
        assert abs(float(sol.cl) - 0.26) < 0.02
        assert abs(float(sol.cm) - (-0.055)) < 0.01

    def test_naca4412_anchors(self):
        sol = solve_inviscid(make_op(naca4(4, 4, 12, 100)), 0.0)
        assert abs(float(sol.cl) - 0.52) < 0.03
        assert abs(float(sol.cm) - (-0.11)) < 0.015

    def test_pressure_drag_near_zero(self, op2412):
        # d'Alembert: inviscid pressure drag is a discretisation residual.
        sol = solve_inviscid(op2412, 5.0)
        assert abs(float(sol.cd_pressure)) < 5e-3

    def test_stagnation_cp_near_one(self, op0012):
        sol = solve_inviscid(op0012, 5.0)
        assert abs(float(jnp.max(sol.cp)) - 1.0) < 0.02


class TestSymmetry:
    def test_symmetric_airfoil_antisymmetric_cl(self, op0012):
        cls = [float(solve_inviscid(op0012, a).cl) for a in (-6.0, 6.0)]
        assert abs(cls[0] + cls[1]) < 5e-3

    def test_kutta_satisfied(self, op0012):
        sol = solve_inviscid(op0012, 8.0)
        g = np.array(sol.gamma)
        assert abs(g[0] + g[-1]) < 1e-4 * max(1.0, np.abs(g).max())


class TestBatching:
    def test_vmap_matches_scalar(self, op2412):
        alphas = jnp.array([-5.0, 0.0, 5.0, 10.0])
        batched = jax.vmap(lambda a: solve_inviscid(op2412, a).cl)(alphas)
        scalar = jnp.stack([solve_inviscid(op2412, a).cl for a in alphas])
        np.testing.assert_allclose(np.array(batched), np.array(scalar),
                                   rtol=1e-5, atol=1e-5)

    def test_lift_curve_slope(self, op0012):
        alphas = jnp.array([0.0, 2.0, 4.0, 6.0])
        cls = jax.vmap(lambda a: solve_inviscid(op0012, a).cl)(alphas)
        slope = np.polyfit(np.deg2rad(np.array(alphas)), np.array(cls), 1)[0]
        # 2*pi * (1 + 0.77 t/c) ~ 6.86 for 12% thickness
        assert 6.3 < slope < 7.3


class TestTranspiration:
    def test_source_outflow_thickens_effective_body(self, op2412):
        base = solve_inviscid(op2412, 5.0)
        sigma = jnp.full(op2412.pan.xm.shape, 0.01)
        blown = solve_inviscid(op2412, 5.0, sigma=sigma)
        # Uniform blowing decambers/thickens: CL must change measurably.
        assert abs(float(blown.cl) - float(base.cl)) > 1e-3

    def test_due_dsigma_linearity(self, op2412):
        rng = np.random.default_rng(1)
        sigma = jnp.asarray(rng.normal(0, 0.01, op2412.pan.xm.shape[0]),
                            dtype=jnp.float32)
        base = solve_inviscid(op2412, 5.0)
        pert = solve_inviscid(op2412, 5.0, sigma=sigma)
        predicted = np.array(base.vt) + np.array(op2412.due_dsigma) @ np.array(sigma)
        np.testing.assert_allclose(np.array(pert.vt), predicted,
                                   rtol=2e-3, atol=2e-3)


class TestOffBody:
    def test_far_field_recovers_freestream(self, op2412):
        sol = solve_inviscid(op2412, 5.0)
        px = jnp.array([50.0])
        py = jnp.array([50.0])
        u, v = velocity_at_points(px, py, op2412, sol.gamma, 5.0)
        np.testing.assert_allclose(float(u[0]), np.cos(np.deg2rad(5)), atol=2e-3)
        np.testing.assert_allclose(float(v[0]), np.sin(np.deg2rad(5)), atol=2e-3)


class TestExactJoukowski:
    """Panel solver vs the closed-form conformal-map solution — analytic
    ground truth with zero transcription error (models/joukowski.py). The
    reference can only validate its solver chain statistically (the XFOIL
    binary is closed); ours is held to the exact solution."""

    CASES = [(-0.08, 0.0, 0.0), (-0.08, 0.0, 5.0),
             (-0.08, 0.04, 4.0), (-0.12, 0.06, 8.0)]

    def _solve(self, mx, my, alpha):
        from airfoil_tpu.models import joukowski, joukowski_exact
        coords = joukowski(mx, my, 401)
        xp, yp = repanel(coords, 160)
        op = build_operator(panel_geometry(xp, yp))
        return solve_inviscid(op, alpha), op, joukowski_exact(
            mx, my, alpha, n=2001)

    def test_cl_within_one_percent(self):
        for mx, my, alpha in self.CASES:
            sol, _op, ex = self._solve(mx, my, alpha)
            if abs(ex["cl"]) < 1e-6:
                assert abs(float(sol.cl)) < 5e-3
            else:
                # 1.5%: float32 end-to-end with default matmul precision
                # (the thick-cambered case at alpha=8 sits at ~1.3%).
                assert abs(float(sol.cl) / ex["cl"] - 1.0) < 0.015, \
                    (mx, my, alpha)

    def test_cp_rms(self):
        for mx, my, alpha in self.CASES:
            sol, op, ex = self._solve(mx, my, alpha)
            xm = np.array(op.pan.xm)
            ym = np.array(op.pan.ym)
            pts = np.stack([ex["x"], ex["y"]], 1)
            mids = np.stack([xm, ym], 1)
            d = np.linalg.norm(pts[None] - mids[:, None], axis=2)
            cp_e = ex["cp"][d.argmin(1)]
            err = np.array(sol.cp) - cp_e
            mask = xm < 0.98  # exclude the cusp neighbourhood
            rms = float(np.sqrt(np.mean(err[mask] ** 2)))
            assert rms < 0.035, (mx, my, alpha, rms)
