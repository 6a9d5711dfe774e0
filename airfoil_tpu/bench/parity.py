"""Parity harness: framework coefficients vs XFOIL ground truth.

Two ground-truth sources, in preference order:

1. A live XFOIL binary (``XFOIL_PATH`` / on PATH) — exact parity runs via
   ``airfoil_tpu.interop.run_xfoil_if_available`` (this is the reference
   implementation's own truth: it shells out per request,
   reference main.py:392-399).
2. The vendored anchor dataset ``data/xfoil_truth.json``: XFOIL 6.96
   ncrit=9 polar anchors with documented provenance and a PER-POINT
   uncertainty band (see the file's provenance notes). Deviations inside
   a point's band are reported but flagged ``within_unc`` — not
   measurable against this table.

Emits ``parity_report.json`` with per-point percentage deviations plus an
aggregate. The north-star target is CL/CD within 2% of XFOIL
(BASELINE.md); the report is how progress toward that is tracked.

CLI: python -m airfoil_tpu.bench.parity [--out parity_report.json]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile

import numpy as np

__all__ = ["run_parity", "load_truth"]

_DATA = os.path.join(os.path.dirname(__file__), "data", "xfoil_truth.json")

_DIGITS = {"naca0012": (0, 0, 12), "naca2412": (2, 4, 12),
           "naca4412": (4, 4, 12)}


def load_truth() -> dict:
    """The vendored anchor dataset, keyed by (airfoil, Re, alpha)."""
    with open(_DATA) as f:
        data = json.load(f)
    return {
        (p["airfoil"], float(p["reynolds"]), float(p["alpha"])): p
        for p in data["points"]
    }


def _solve_polar_points(name: str, re_: float, alphas):
    """Solve the anchor points through the PRODUCT path: a full polar via
    ``solve_polar``, whose continuation walk audits each point against the
    local trend and re-solves wrong-basin outliers — the accuracy the API
    actually serves. Bare per-point solves land on a knife edge between
    basins on some anchors; the polar machinery exists to settle that.
    """
    import numpy as _np

    from airfoil_tpu.models import naca4
    from airfoil_tpu.polar.sweep import MODE_VISCOUS, solve_polar

    hi = max(9.0, max(float(a) for a in alphas))
    grid = sorted(set(_np.arange(-2.0, hi + 0.01, 0.5).tolist())
                  | {float(a) for a in alphas})
    res = solve_polar(_np.asarray(naca4(*_DIGITS[name], 100), _np.float32),
                      _np.asarray(grid, _np.float32), re_)
    out = {}
    garr = _np.asarray(grid)
    for a in alphas:
        # Exact membership, not nearest-match: the grid was built as the
        # union of the 0.5-degree sweep and the anchor alphas, so every
        # anchor must be present bit-exactly — a silent nearest snap would
        # misattribute a fractional anchor to its neighbour.
        matches = _np.nonzero(_np.abs(garr - a) < 1e-9)[0]
        assert matches.size == 1, f"anchor alpha {a} not on the polar grid"
        i = int(matches[0])
        out[a] = (float(res.cl[i]), float(res.cd[i]),
                  int(res.mode[i]) == MODE_VISCOUS)
    return out


def _xfoil_truth(name: str, re_: float, alpha: float):
    from airfoil_tpu.interop import run_xfoil_if_available
    from airfoil_tpu.models import naca4

    with tempfile.TemporaryDirectory() as wd:
        path = os.path.join(wd, f"{name}.dat")
        coords = naca4(*_DIGITS[name], 100)
        with open(path, "w") as f:
            f.write(f"{name}\n")
            for x, y in coords:
                f.write(f" {x:.6f} {y:.6f}\n")
        out = run_xfoil_if_available(path, re_, alpha, wd)
    if out is None:
        return None
    coeffs = out[0]
    return coeffs.get("CL"), coeffs.get("CD")


def run_parity(use_live_xfoil: bool = True) -> dict:
    anchors = load_truth()
    points = []
    live_used = False
    groups = {}
    for (name, re_, alpha) in anchors:
        groups.setdefault((name, re_), []).append(alpha)
    solved = {
        key: _solve_polar_points(key[0], key[1], alphas)
        for key, alphas in groups.items()
    }
    for (name, re_, alpha), anchor in anchors.items():
        truth = _xfoil_truth(name, re_, alpha) if use_live_xfoil else None
        source = "xfoil_binary" if truth else "vendored_table"
        live_used = live_used or truth is not None
        cl_ref, cd_ref = truth if truth else (anchor["cl"], anchor["cd"])
        cl, cd, converged = solved[(name, re_)][alpha]
        cl_dev = (100 * (cl - cl_ref) / abs(cl_ref)
                  if abs(cl_ref) > 0.02 else None)
        cd_dev = 100 * (cd - cd_ref) / cd_ref if cd_ref else None
        # Measurability: is the deviation inside the anchor's own
        # uncertainty band? (Live-XFOIL truth is exact: band = 0.)
        unc_cl = 0.0 if truth else anchor.get("unc_cl", 0.0)
        unc_cd = 0.0 if truth else anchor.get("unc_cd_rel", 0.0)
        within = (abs(cl - cl_ref) <= unc_cl
                  and (not cd_ref
                       or abs(cd - cd_ref) <= unc_cd * cd_ref))
        points.append({
            "airfoil": name, "reynolds": re_, "alpha": alpha,
            "cl": round(cl, 4), "cl_ref": cl_ref,
            "cd": round(cd, 5), "cd_ref": cd_ref,
            "cl_dev_pct": round(cl_dev, 1) if cl_dev is not None else None,
            "cd_dev_pct": round(cd_dev, 1) if cd_dev is not None else None,
            "unc_cl": unc_cl, "unc_cd_rel": unc_cd,
            "within_unc": bool(within),
            "converged": converged, "truth_source": source,
        })
    cl_devs = [abs(p["cl_dev_pct"]) for p in points
               if p["cl_dev_pct"] is not None and p["converged"]]
    cd_devs = [abs(p["cd_dev_pct"]) for p in points
               if p["cd_dev_pct"] is not None and p["converged"]]
    # All-anchor CD metric: an unconverged anchor (served as an inviscid
    # fill with CD = 0) counts as 100% error — the converged-only median
    # above would otherwise silently drop exactly the hardest anchors.
    cd_devs_all = [abs(p["cd_dev_pct"]) if p["converged"] else 100.0
                   for p in points if p["cd_dev_pct"] is not None]
    # Envelope coverage: max converged alpha per (airfoil, Re) group —
    # the reference serves the full -10..+20 envelope (main.py:39-45), so
    # "how far up the polar does viscous convergence reach" is a
    # first-class capability metric, not a footnote.
    env = {}
    for p in points:
        key = f"{p['airfoil']}@{p['reynolds']:.0e}"
        if p["converged"]:
            env[key] = max(env.get(key, -99.0), p["alpha"])
        else:
            env.setdefault(key, -99.0)
    return {
        "points": points,
        "median_abs_cl_dev_pct": round(float(np.median(cl_devs)), 1)
        if cl_devs else None,
        "median_abs_cd_dev_pct": round(float(np.median(cd_devs)), 1)
        if cd_devs else None,
        "median_abs_cd_dev_all_anchors_pct": round(
            float(np.median(cd_devs_all)), 1) if cd_devs_all else None,
        "max_converged_alpha": env,
        "converged_fraction": round(
            np.mean([p["converged"] for p in points]), 2),
        "within_unc_fraction": round(
            np.mean([p["within_unc"] for p in points]), 2),
        "ground_truth": "live xfoil" if live_used else
        "vendored dataset bench/data/xfoil_truth.json (XFOIL 6.96 "
        "ncrit=9 anchors with per-point uncertainty; see its provenance "
        "notes)",
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="parity_report.json")
    args = ap.parse_args()
    # Share the server/bench persistent compile cache — a bare CLI run
    # otherwise pays every polar-pipeline cold compile (~10 min on a
    # remote-compile TPU tunnel) before the first number appears.
    from airfoil_tpu.utils.compile_cache import enable_persistent_compile_cache
    enable_persistent_compile_cache()
    report = run_parity()
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
