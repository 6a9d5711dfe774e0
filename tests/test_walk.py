"""Fast unit tests for the polar continuation walk's decision logic.

The walk's solver calls are stubbed (monkeypatched module global), so
these tests compile in seconds and pin down the audit/repair semantics:
trend bands, the monotone-deficit audit, turn reset, carry hand-off,
re-anchoring after consecutive failures, and the tier-2 trip rescue.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import airfoil_tpu.polar.sweep as S


def _hist(n, a1=0.0, cl1=0.0, cd1=0.0, a2=0.0, cl2=0.0, cd2=0.0,
          cli1=0.0, d1=0.0):
    return (jnp.asarray(n, jnp.int32), jnp.asarray(a1, jnp.float32),
            jnp.asarray(cl1, jnp.float32), jnp.asarray(cd1, jnp.float32),
            jnp.asarray(a2, jnp.float32), jnp.asarray(cl2, jnp.float32),
            jnp.asarray(cd2, jnp.float32), jnp.asarray(cli1, jnp.float32),
            jnp.asarray(d1, jnp.float32))


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


class TestDeficitOk:
    def test_empty_history_accepts(self):
        assert bool(S._deficit_ok(0.0, 0.5, _hist(0)))

    def test_growing_deficit_accepted(self):
        # Shoulder step: loading 1.20 -> 1.32, deficit 0.10 -> 0.13.
        h = _hist(2, a1=8.0, cli1=1.20, d1=0.10)
        assert bool(S._deficit_ok(0.13, 1.32, h))

    def test_shrunk_deficit_rejected_when_loading_grows(self):
        # The relieved wrong basin rides the inviscid slope: its deficit
        # SHRINKS as the loading climbs. 0.10 -> 0.04 must fail.
        h = _hist(2, a1=8.0, cli1=1.20, d1=0.10)
        assert not bool(S._deficit_ok(0.04, 1.32, h))

    def test_one_sided_only_when_loading_grows(self):
        # Walking DOWN in loading (descent toward zero lift) the deficit
        # legitimately shrinks.
        h = _hist(2, a1=9.0, cli1=1.32, d1=0.10)
        assert bool(S._deficit_ok(0.04, 1.20, h))

    def test_slow_relief_rejected_over_reanchor_gap(self):
        # The round-4 failure: after a 5.5-deg gap of failed points, a
        # wrong-basin per-point state at 17 deg carried deficit 0.25 vs
        # the honest 11.5-deg anchor's 0.24 (loading 1.65 -> 2.30) —
        # growth 10x below the honest shoulder rate. The rate floor must
        # reject it while passing the honest state (deficit 0.57).
        h = _hist(2, a1=11.5, cli1=1.65, d1=0.24)
        assert not bool(S._deficit_ok(0.25, 2.30, h))
        assert bool(S._deficit_ok(0.57, 2.30, h))

    def test_disengaged_below_baseline_threshold(self):
        # Attached flow near zero lift: deficits are station-quantisation
        # noise (+-0.01-0.02 CL). With baseline d1 < 0.05 the audit has
        # no calibration and must pass ANY wiggle — an engaged zero-slack
        # floor here rejected honest alpha=2..6 on the 1-deg 2412 polar
        # and cascaded into a wrong re-anchor at alpha=7.
        h = _hist(2, a1=1.0, cli1=0.42, d1=0.04)
        assert bool(S._deficit_ok(0.01, 0.54, h))
        # Mirror case on the cambered negative branch, where viscous
        # decambering makes the signed deficit cross zero.
        h = _hist(2, a1=-2.0, cli1=0.05, d1=0.04)
        assert bool(S._deficit_ok(-0.02, 0.07, h))

    def test_one_degree_step_wiggle_tolerated(self):
        # Engaged (d1 >= 0.05): a 1-deg step (dcli ~ 0.12) with a small
        # deficit DIP must still pass — the 0.025 slack covers transition
        # front quantisation between adjacent points.
        h = _hist(2, a1=6.0, cli1=0.90, d1=0.06)
        assert bool(S._deficit_ok(0.045, 1.02, h))

    def test_negative_alpha_symmetry(self):
        # Deep on the negative branch the loading |cli| grows as alpha
        # falls; a shrinking engaged deficit is the same wrong basin.
        h = _hist(2, a1=-6.0, cli1=0.55, d1=0.08)
        assert not bool(S._deficit_ok(0.02, 0.70, h))
        assert bool(S._deficit_ok(0.10, 0.70, h))

    def test_deficit_sign_convention(self):
        # Positive lift: deficit = cl_inv - cl; negative lift mirrored.
        assert float(S._deficit(1.0, 0.8)) == pytest.approx(0.2)
        assert float(S._deficit(-1.0, -0.8)) == pytest.approx(0.2)


def _fake_inputs(p, nok_mask, cl=None, cli=None):
    """Build walk inputs for ``p`` sorted alphas with given per-point
    convergence flags; per-point CL follows a clean 0.1/deg line unless
    overridden, and the inviscid CL a 0.12/deg line offset +0.05 (honest
    deficit growing 0.02/deg) unless overridden."""
    alphas = jnp.arange(p, dtype=jnp.float32)
    re = jnp.full((p,), 1e6, jnp.float32)
    cl = (0.1 * alphas if cl is None
          else jnp.asarray(cl, jnp.float32))
    cli = (0.12 * alphas + 0.05 if cli is None
           else jnp.asarray(cli, jnp.float32))
    cd = jnp.full((p,), 0.007, jnp.float32)
    zeros = jnp.zeros((p,), jnp.float32)
    m1 = (cl, cd, zeros, zeros, jnp.asarray(nok_mask),
          zeros, zeros, zeros)
    nok1 = jnp.asarray(nok_mask)
    st1 = (jnp.tile(jnp.arange(p, dtype=jnp.float32)[:, None], (1, 4)),
           zeros, zeros)
    return alphas, re, m1, nok1, st1, cli


def _run_walk(monkeypatch, p, nok_mask, cont_behaviour, cl=None,
              cli=None, trip_behaviour=None):
    """Run _walk over one ascending segment with a stubbed cont solver.

    ``cont_behaviour(a, state) -> (cl, cd, nok)`` as jnp scalars; the
    tier-2 trip rescue (identified by its x_forced_transition kwarg) uses
    ``trip_behaviour`` when given, else the same stub.
    """
    def fake_cont(op, a, re_, zz, xu, xl, n_stations=None,
                  x_forced_transition=None,
                  x_forced_transition_lower=None,
                  cont_slack_add=None, cont_slack_mul=None,
                  cont_slack_add_l=None, cont_slack_mul_l=None):
        fn = cont_behaviour
        if x_forced_transition is not None and trip_behaviour is not None:
            fn = trip_behaviour
        clc, cdc, nokc = fn(a, zz)
        merged = (clc, cdc, jnp.zeros(()), jnp.zeros(()), nokc,
                  jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))
        return merged, (nokc, (zz + 1.0, xu, xl))

    monkeypatch.setattr(S, "solve_polar_point_cont", fake_cont)
    alphas, re, m1, nok1, st1, cli = _fake_inputs(p, nok_mask, cl, cli)
    active = jnp.ones((p,), bool)
    seg_start = jnp.zeros((p,), bool)
    slack_seq = (jnp.full((p,), 0.005, jnp.float32),
                 jnp.zeros((p,), jnp.float32),
                 jnp.full((p,), 0.15, jnp.float32),
                 jnp.full((p,), 0.5, jnp.float32))
    state_like = jax.tree.map(lambda x: x[0], st1)
    m_walk, used = S._walk(None, alphas, re, active, seg_start, cli,
                           slack_seq, m1, nok1, st1, state_like)
    return (np.asarray(m_walk[0]), np.asarray(m_walk[1]),
            np.asarray(used))


class TestWalk:
    def test_clean_polar_adopts_everything(self, monkeypatch):
        # Tracing always visits cont; use a benign stub and check the
        # OUTPUT equals the per-point values.
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

    def test_deficit_audit_rejects_relieved_per_point(self, monkeypatch):
        def cont_dead(a, zz):
            return (jnp.asarray(0.0), jnp.asarray(0.0),
                    jnp.asarray(False))

        # Per-point CL rides INSIDE the trend band each step (slope
        # 0.14/deg, band 0.095/step) so the trend audit alone accepts the
        # whole chain — but the deficit vs the inviscid line (0.12a +
        # 0.05) shrinks 0.02/step, which the deficit-growth audit must
        # reject.
        cl_in = [0.00, 0.14, 0.28, 0.42, 0.56, 0.70]
        cl, cd, used = _run_walk(monkeypatch, 6, [True] * 6, cont_dead,
                                 cl=cl_in)
        assert used[0]
        assert not used[1:].any()

    def test_reanchor_after_two_failures(self, monkeypatch):
        def cont(a, zz):
            return (jnp.asarray(0.0), jnp.asarray(0.0),
                    jnp.asarray(False))   # continuation never converges

        # Per-point results drop to a new lower level at index 2 (off the
        # old trend, like a post-stall thick branch): with cont dead, 2
        # and 3 fail, then index 4 re-anchors (deficit GREW, so the
        # deficit audit allows the new anchor).
        cl_in = [0.0, 0.1, -0.4, -0.35, -0.3, -0.25]
        cl, cd, used = _run_walk(monkeypatch, 6, [True] * 6, cont,
                                 cl=cl_in)
        assert used[0] and used[1]
        assert not used[2] and not used[3]
        assert used[4] and used[5]
        np.testing.assert_allclose(cl[4], -0.3, atol=1e-6)

    def test_reanchor_refused_for_relieved_jump(self, monkeypatch):
        def cont(a, zz):
            return (jnp.asarray(0.0), jnp.asarray(0.0),
                    jnp.asarray(False))

        # Per-point results jump UP toward the inviscid line at index 2
        # and then RIDE its slope (0.12/step, frozen deficit): a relieved
        # wrong basin. The deficit audit must block the re-anchor that
        # the pre-round-5 walk would have taken.
        cl_in = [0.0, 0.1, 0.35, 0.47, 0.59, 0.71]
        cl, cd, used = _run_walk(monkeypatch, 6, [True] * 6, cont,
                                 cl=cl_in)
        assert used[0] and used[1]
        assert not used[2:].any()

    def test_trip_rescue_repairs_when_free_cont_fails(self, monkeypatch):
        def cont_dead(a, zz):
            return (jnp.asarray(0.0), jnp.asarray(0.0),
                    jnp.asarray(False))

        def trip_ok(a, zz):
            return (0.1 * a, jnp.asarray(0.007), jnp.asarray(True))

        nok = [True, True, True, False, True, True]
        cl, cd, used = _run_walk(monkeypatch, 6, nok, cont_dead,
                                 trip_behaviour=trip_ok)
        assert used.all()
        np.testing.assert_allclose(cl[3], 0.3, atol=1e-6)

    def test_trip_rescue_result_still_audited(self, monkeypatch):
        def cont_dead(a, zz):
            return (jnp.asarray(0.0), jnp.asarray(0.0),
                    jnp.asarray(False))

        def trip_garbage(a, zz):
            return (jnp.asarray(5.0), jnp.asarray(0.0001),
                    jnp.asarray(True))

        nok = [True, True, True, False, True, True]
        cl, cd, used = _run_walk(monkeypatch, 6, nok, cont_dead,
                                 trip_behaviour=trip_garbage)
        assert not used[3]
