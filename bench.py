"""Headline benchmark: viscous polar throughput (+ LBM MLUPS when built).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

Baseline: the reference computes each polar point as one XFOIL subprocess
round-trip quoted at 30-60 s on its hosting tier (reference
pages/Airfoil_Analysis.py:1010; timeouts 90 s/90 s/20 s at main.py:296-323)
=> 1/30 points/sec is the generous reference rate. The LBM reference rate
is the browser tunnel's ~12.3 MLUPS (SURVEY.md section 6).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compiled-kernel cache: repeat bench runs (and the server,
# which shares the cache) skip the multi-minute cold compiles.
from airfoil_tpu.api.handlers import _enable_persistent_compile_cache

_enable_persistent_compile_cache()

BASELINE_POINTS_PER_SEC = 1.0 / 30.0
BASELINE_LBM_MLUPS = 12.3


def bench_polar():
    from airfoil_tpu.models import naca4
    from airfoil_tpu.polar.sweep import _polar_kernel

    coords = jnp.asarray(np.asarray(naca4(2, 4, 12, 100), np.float32))
    alphas = jnp.arange(-10.0, 20.5, 1.0, dtype=jnp.float32)  # 31 points
    res = jnp.arange(31, dtype=jnp.float32) * 0.0 + 1e6

    from airfoil_tpu.utils.profiling import device_sync

    # Warm up (compile).
    out = _polar_kernel(coords, alphas, res)
    device_sync(out[0])

    n_rep = 3
    t0 = time.perf_counter()
    for rep in range(n_rep):
        # Perturb inputs so no layer can serve a cached execution.
        out = _polar_kernel(coords, alphas + 0.001 * rep, res)
        device_sync(out[0])  # forced fetch: block_until_ready can lie here
    dt = (time.perf_counter() - t0) / n_rep

    n_points = int(alphas.shape[0])
    pps = n_points / dt
    # Mode accounting. The old "converged_fraction" was use1|use2|use3 which
    # is identically 1.0 (the inviscid fill always "converges") — report the
    # viscous-mode fraction instead: the share of polar points carrying a
    # real viscous solution (mode != MODE_INVISCID).
    mode = np.asarray(out[4])
    n_visc = int(np.sum(mode == 0))
    n_smooth = int(np.sum(mode == 1))
    n_inv = int(np.sum(mode == 2))
    return {
        "points_per_sec": pps,
        "polar_seconds": dt,
        "n_points": n_points,
        "viscous_fraction": (n_visc + n_smooth) / n_points,
        "mode_counts": {"viscous": n_visc, "viscous_smoothed": n_smooth,
                        "inviscid": n_inv},
    }


def bench_lbm():
    try:
        from airfoil_tpu.lbm import bench_mlups
    except ImportError:
        return None
    return bench_mlups()


def main():
    polar = bench_polar()
    lbm = bench_lbm()

    extra = {
        "polar_seconds_31pts": round(polar["polar_seconds"], 4),
        "viscous_fraction": round(polar["viscous_fraction"], 3),
        "mode_counts": polar["mode_counts"],
        "device": str(jax.devices()[0]),
    }
    if lbm is not None:
        extra["lbm_mlups"] = round(lbm["mlups"], 1)
        extra["lbm_vs_baseline"] = round(lbm["mlups"] / BASELINE_LBM_MLUPS, 1)

    # Accuracy alongside speed: the checked-in parity report (regenerated
    # by `python -m airfoil_tpu.bench.parity` through the product path;
    # see airfoil_tpu/bench/results/). Read, not recomputed — a parity run
    # costs several solver compiles and belongs to its own harness.
    try:
        import os

        rep = os.path.join(os.path.dirname(__file__), "airfoil_tpu",
                           "bench", "results", "parity_report.json")
        with open(rep) as f:
            parity = json.load(f)
        extra["parity"] = {
            "median_abs_cl_dev_pct": parity["median_abs_cl_dev_pct"],
            "median_abs_cd_dev_pct": parity["median_abs_cd_dev_pct"],
            "converged_fraction": parity["converged_fraction"],
            "ground_truth": parity["ground_truth"],
        }
    except Exception:
        pass

    print(json.dumps({
        "metric": "viscous_polar_points_per_sec",
        "value": round(polar["points_per_sec"], 2),
        "unit": "points/sec",
        "vs_baseline": round(
            polar["points_per_sec"] / BASELINE_POINTS_PER_SEC, 1),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
