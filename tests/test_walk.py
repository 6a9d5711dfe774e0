"""Fast unit tests for the polar continuation walk's decision logic.

The walk's solver calls are stubbed (monkeypatched module global), so
these tests compile in seconds and pin down the audit/repair semantics:
trend bands, turn reset, carry hand-off, and re-anchoring after
consecutive failures.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import airfoil_tpu.polar.sweep as S


def _hist(n, a1=0.0, cl1=0.0, cd1=0.0, a2=0.0, cl2=0.0, cd2=0.0):
    return (jnp.asarray(n, jnp.int32), jnp.asarray(a1, jnp.float32),
            jnp.asarray(cl1, jnp.float32), jnp.asarray(cd1, jnp.float32),
            jnp.asarray(a2, jnp.float32), jnp.asarray(cl2, jnp.float32),
            jnp.asarray(cd2, jnp.float32))


class TestTrendOk:
    def test_empty_history_accepts_anything(self):
        assert bool(S._trend_ok(5.0, 99.0, 9.0, _hist(0)))

    def test_two_point_extrapolation_accepts_on_trend(self):
        # slope 0.1/deg through (3, 0.3) and (4, 0.4) -> 0.5 at 5.
        h = _hist(2, a1=4.0, cl1=0.4, cd1=0.007, a2=3.0, cl2=0.3,
                  cd2=0.0068)
        assert bool(S._trend_ok(5.0, 0.5, 0.0072, h))

    def test_two_point_extrapolation_rejects_cl_jump(self):
        h = _hist(2, a1=4.0, cl1=0.4, cd1=0.007, a2=3.0, cl2=0.3,
                  cd2=0.0068)
        # Wrong-basin jumps are >= 15% in CL; 0.5 -> 0.75 must fail.
        assert not bool(S._trend_ok(5.0, 0.75, 0.0072, h))

    def test_two_point_extrapolation_rejects_cd_collapse(self):
        h = _hist(2, a1=4.0, cl1=0.4, cd1=0.008, a2=3.0, cl2=0.3,
                  cd2=0.0078)
        # A spurious thin-branch CD (half physical) must fail.
        assert not bool(S._trend_ok(5.0, 0.5, 0.003, h))

    def test_single_point_band_is_wide(self):
        h = _hist(1, a1=4.0, cl1=0.4, cd1=0.007)
        # One-point history: full lift-slope uncertainty over 1 degree.
        assert bool(S._trend_ok(5.0, 0.52, 0.008, h))


def _fake_inputs(p, nok_mask, cl=None):
    """Build walk inputs for ``p`` sorted alphas with given per-point
    convergence flags; per-point CL follows a clean 0.1/deg line unless
    overridden."""
    alphas = jnp.arange(p, dtype=jnp.float32)
    re = jnp.full((p,), 1e6, jnp.float32)
    cl = (0.1 * alphas if cl is None
          else jnp.asarray(cl, jnp.float32))
    cd = jnp.full((p,), 0.007, jnp.float32)
    zeros = jnp.zeros((p,), jnp.float32)
    m1 = (cl, cd, zeros, zeros, jnp.asarray(nok_mask),
          zeros, zeros, zeros)
    nok1 = jnp.asarray(nok_mask)
    st1 = (jnp.tile(jnp.arange(p, dtype=jnp.float32)[:, None], (1, 4)),
           zeros, zeros)
    return alphas, re, m1, nok1, st1


def _run_walk(monkeypatch, p, nok_mask, cont_behaviour, cl=None):
    """Run _walk over one ascending segment with a stubbed cont solver.

    ``cont_behaviour(a, state) -> (cl, cd, nok)`` as jnp scalars.
    """
    def fake_cont(op, a, re_, zz, xu, xl, n_stations=None,
                  cont_slack_add=None, cont_slack_mul=None,
                  cont_slack_add_l=None, cont_slack_mul_l=None):
        clc, cdc, nokc = cont_behaviour(a, zz)
        merged = (clc, cdc, jnp.zeros(()), jnp.zeros(()), nokc,
                  jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))
        return merged, (nokc, (zz + 1.0, xu, xl))

    monkeypatch.setattr(S, "solve_polar_point_cont", fake_cont)
    alphas, re, m1, nok1, st1 = _fake_inputs(p, nok_mask, cl)
    active = jnp.ones((p,), bool)
    seg_start = jnp.zeros((p,), bool)
    slack_seq = (jnp.full((p,), 0.005, jnp.float32),
                 jnp.zeros((p,), jnp.float32),
                 jnp.full((p,), 0.15, jnp.float32),
                 jnp.full((p,), 0.5, jnp.float32))
    state_like = jax.tree.map(lambda x: x[0], st1)
    m_walk, used = S._walk(None, alphas, re, active, seg_start, slack_seq,
                           m1, nok1, st1, state_like)
    return (np.asarray(m_walk[0]), np.asarray(m_walk[1]),
            np.asarray(used))


class TestWalk:
    def test_clean_polar_adopts_everything(self, monkeypatch):
        def cont(a, zz):
            raise AssertionError  # never traced when nothing fails

        # Tracing always visits cont; use a benign stub instead and check
        # the OUTPUT equals the per-point values.
        def cont_ok(a, zz):
            return (jnp.asarray(-99.0), jnp.asarray(0.5),
                    jnp.asarray(True))

        cl, cd, used = _run_walk(monkeypatch, 6, [True] * 6, cont_ok)
        assert used.all()
        np.testing.assert_allclose(cl, 0.1 * np.arange(6), atol=1e-6)

    def test_failed_point_repaired_by_continuation(self, monkeypatch):
        def cont(a, zz):
            return (0.1 * a, jnp.asarray(0.007), jnp.asarray(True))

        nok = [True, True, True, False, True, True]
        cl, cd, used = _run_walk(monkeypatch, 6, nok, cont)
        assert used.all()
        # Point 3 takes the continuation value (same clean line here).
        np.testing.assert_allclose(cl[3], 0.3, atol=1e-6)

    def test_off_trend_cont_result_not_adopted(self, monkeypatch):
        def cont(a, zz):
            # Converged-looking garbage, far off the local trend.
            return (jnp.asarray(5.0), jnp.asarray(0.0001),
                    jnp.asarray(True))

        nok = [True, True, True, False, True, True]
        cl, cd, used = _run_walk(monkeypatch, 6, nok, cont)
        assert not used[3]          # audit rejects the wrong basin
        assert used[4] and used[5]  # later points re-adopt per-point

    def test_reanchor_after_two_failures(self, monkeypatch):
        def cont(a, zz):
            return (jnp.asarray(0.0), jnp.asarray(0.0),
                    jnp.asarray(False))   # continuation never converges

        # Per-point results jump to a new level at index 2 (off the old
        # trend): with cont dead, 2 and 3 fail, then index 4 re-anchors.
        cl_in = [0.0, 0.1, 1.0, 1.1, 1.2, 1.3]
        cl, cd, used = _run_walk(monkeypatch, 6, [True] * 6, cont,
                                 cl=cl_in)
        assert used[0] and used[1]
        assert not used[2] and not used[3]
        assert used[4] and used[5]
        np.testing.assert_allclose(cl[4], 1.2, atol=1e-6)
