"""Single-point analysis with the reference's three-strategy fallback.

Mirrors ``run_xfoil_sync`` (reference main.py:284-325) including its output
contract: Cp distribution, coefficient dict with ``mode`` tag ("viscous" /
"inviscid", main.py:504-506), the inviscid ``warning`` string
(main.py:506), and the boundary-layer data schema produced by
``parse_bl_dump`` (main.py:199-281): upper rows run TE->LE, lower rows
LE->TE, each row ``{x, y, dstar, theta, cf, H}``, plus the per-side
transition locations (which here are *predicted* by the e^N envelope, not
detected post-hoc from Cf jumps).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from airfoil_tpu.inviscid import build_operator, solve_inviscid
from airfoil_tpu.paneling import panel_geometry, repanel, smooth_geometry
from airfoil_tpu.viscous import solve_viscous
from airfoil_tpu.viscous.coupled import SideBL, ViscousResult
from airfoil_tpu.viscous.newton import solve_viscous_newton

__all__ = ["AnalysisResult", "analyze_airfoil"]

INVISCID_WARNING = "INVISCID MODE - CD is unrealistically low"


@dataclass
class AnalysisResult:
    """JSON-ready single-point result (reference schema, main.py:605-615)."""

    cp_x: list
    cp_values: list
    coefficients: dict
    bl_data: dict | None
    mode: str
    strategy: int           # 1 viscous / 2 viscous+smoothed / 3 inviscid
    converged: bool
    sep_fraction: float = 0.0
    extras: dict = field(default_factory=dict)


def _side_rows(side: SideBL, reverse: bool) -> list[dict]:
    x = np.asarray(side.x, np.float64)
    y = np.asarray(side.y, np.float64)
    th = np.asarray(side.theta, np.float64)
    ds = np.asarray(side.dstar, np.float64)
    cf = np.asarray(side.cf, np.float64)
    hk = np.asarray(side.hk, np.float64)
    idx = range(len(x) - 1, -1, -1) if reverse else range(len(x))
    return [
        {
            "x": float(x[i]), "y": float(y[i]),
            "dstar": float(ds[i]), "theta": float(th[i]),
            "cf": float(cf[i]), "H": float(hk[i]),
        }
        for i in idx
    ]


def _bl_payload(res: ViscousResult) -> dict:
    xtr_u = float(res.upper.x_transition)
    xtr_l = float(res.lower.x_transition)
    return {
        # XFOIL DUMP convention: upper section TE -> LE (main.py:206-208).
        "upper": _side_rows(res.upper, reverse=True),
        "lower": _side_rows(res.lower, reverse=False),
        "transition_upper_x": xtr_u if xtr_u < 0.99 else None,
        "transition_lower_x": xtr_l if xtr_l < 0.99 else None,
    }


def analyze_airfoil(
    coords,
    reynolds: float,
    alpha: float,
    n_panels: int = 160,
    n_crit: float = 9.0,
    x_forced_transition: float = 1.0,
) -> AnalysisResult:
    """Three-strategy single-point analysis.

    Strategy 1: viscous, clean geometry. Strategy 2: viscous, smoothed
    geometry (the TPU-native GDES SMOO, reference main.py:305-313).
    Strategy 3: inviscid fallback with no BL data and the reference's
    warning string (main.py:315-323,506).
    """
    coords = jnp.asarray(np.asarray(coords, np.float32))
    xp, yp = repanel(coords, n_panels)
    pan = panel_geometry(xp, yp)
    op = build_operator(pan)

    def coeffs(cl, cd, cdp, cm, mode):
        out = {
            "CL": round(float(cl), 4),
            "CD": round(float(cd), 6),
            "CDp": round(float(cdp), 6),
            "Cm": round(float(cm), 4),
            "mode": mode,
        }
        if mode == "inviscid":
            out["warning"] = INVISCID_WARNING
        return out

    def cp_x_of(the_op):
        # Midpoints of the operator actually solved: strategy 2's smoothed
        # paneling shifts midpoints slightly, and pairing its cp_values
        # with the clean midpoints would skew the reported distribution.
        return [float(v) for v in np.asarray(the_op.pan.xm, np.float64)]

    def solve_best(the_op):
        """Simultaneous-Newton solve first (XFOIL-class accuracy); when it
        flags a wrong-basin / unconverged solution, retry by
        alpha-continuation from a gentler operating point (the same basin
        control the polar walk applies — a single hard-alpha request gets
        the rescue a sweep would give it); finally the direct
        under-relaxed iteration (robust but ~biased thick)."""
        res = solve_viscous_newton(the_op, float(alpha), float(reynolds),
                                   n_crit=n_crit,
                                   x_forced_transition=x_forced_transition)
        if bool(res.converged):
            return res

        from airfoil_tpu.viscous.newton import (
            solve_polar_point,
            solve_polar_point_cont,
            solve_viscous_newton_cont,
        )

        a_t = float(alpha)
        a_seed = 0.6 * a_t if abs(a_t) > 3.0 else 0.0
        _m, (nok, st) = solve_polar_point(
            the_op, a_seed, float(reynolds), n_crit=n_crit,
            x_forced_transition=x_forced_transition)
        if bool(nok):
            # One intermediate hop when the gap is wide, then the target.
            hops = ([a_seed + 0.8 * (a_t - a_seed)]
                    if abs(a_t - a_seed) > 2.5 else [])
            for a_i in hops:
                _m, (nok_i, st_i) = solve_polar_point_cont(
                    the_op, a_i, float(reynolds), *st, n_crit=n_crit,
                    x_forced_transition=x_forced_transition)
                if not bool(nok_i):
                    st = None
                    break
                st = st_i
            if st is not None:
                res_c = solve_viscous_newton_cont(
                    the_op, a_t, float(reynolds), *st, n_crit=n_crit,
                    x_forced_transition=x_forced_transition)
                if bool(res_c.converged):
                    return res_c

        return solve_viscous(the_op, float(alpha), float(reynolds),
                             n_crit=n_crit,
                             x_forced_transition=x_forced_transition)

    # Strategies 1 and 2: viscous on clean then smoothed geometry.
    for strategy, the_op in ((1, op), (2, None)):
        if strategy == 2:
            xs, ys = smooth_geometry(xp, yp)
            the_op = build_operator(panel_geometry(xs, ys))
        res = solve_best(the_op)
        if bool(res.converged):
            return AnalysisResult(
                cp_x=cp_x_of(the_op),
                cp_values=[float(v) for v in np.asarray(res.cp, np.float64)],
                coefficients=coeffs(res.cl, res.cd, res.cdp, res.cm,
                                    "viscous"),
                bl_data=_bl_payload(res),
                mode="viscous",
                strategy=strategy,
                converged=True,
                sep_fraction=float(res.sep_fraction),
            )

    # Strategy 3: inviscid fallback (no BL data; reference main.py:315-323).
    sol = solve_inviscid(op, float(alpha))
    return AnalysisResult(
        cp_x=cp_x_of(op),
        cp_values=[float(v) for v in np.asarray(sol.cp, np.float64)],
        coefficients=coeffs(sol.cl, 0.0, 0.0, sol.cm, "inviscid"),
        bl_data=None,
        mode="inviscid",
        strategy=3,
        converged=True,
    )
