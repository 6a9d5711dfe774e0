"""Transport-independent API handlers.

All endpoint logic lives here as plain functions mapping parsed inputs to
``(status_code, payload_dict)``; the FastAPI app (``server.py``) and the
dependency-free stdlib server (``minihttp.py``) are thin transports over
these. Contracts follow the reference backend (main.py:522-634): identical
validation envelope and the exact ``/upload_airfoil/`` response schema
(main.py:605-615).
"""

from __future__ import annotations

import base64
import logging
import threading
import time
import uuid

import numpy as np

from airfoil_tpu import config
from airfoil_tpu.geometry import (
    AirfoilParseError,
    is_multi_element,
    parse_dat_text,
)
from airfoil_tpu.utils.compile_cache import enable_persistent_compile_cache
from airfoil_tpu.utils.stats import increment_analysis_count

logger = logging.getLogger(__name__)

__all__ = [
    "ApiError", "handle_root", "handle_health", "handle_upload",
    "handle_polar", "handle_batch", "LBMSessions",
]


class ApiError(Exception):
    def __init__(self, status_code: int, detail: str):
        super().__init__(detail)
        self.status_code = status_code
        self.detail = detail


# Back-compat alias; the shared helper lives in utils (used by bench.py
# and the parity harness too).
_enable_persistent_compile_cache = enable_persistent_compile_cache


def start_warmup():
    """Compile the standard-shape solver kernels in a background thread.

    The analysis path's kernels (per-point Newton, continuation rescue)
    take minutes to compile on a cold TPU tunnel; without warmup the
    FIRST hard-alpha request eats that compile inside the request and
    blows client timeouts. The reference has the same class of problem in
    a different coat (XFOIL's 90 s per-strategy timeout, main.py:300) —
    here one warmup per process removes it. Requests arriving during
    warmup simply share the compilation via JAX's internal cache locks.
    """
    _enable_persistent_compile_cache()

    def _warm():
        try:
            from airfoil_tpu.models import naca4
            from airfoil_tpu.polar import analyze_airfoil, warm_polar_kernels

            coords = naca4(2, 4, 12, 60)
            # The polar pipeline first: /polar/ is the flagship endpoint
            # and its kernels (batched pass + walk + rescue) are the
            # biggest compiles — warmed CONCURRENTLY (one thread per
            # dispatch; wall ~ the largest single compile instead of the
            # sum). A -10..20 sweep lands in the 32-point bucket every
            # served sweep up to 32 points then reuses, so a cold
            # server's first /polar/ request runs compile-free.
            t0 = time.perf_counter()
            warm_polar_kernels(p=32)
            logger.info("polar warmup done in %.1fs",
                        time.perf_counter() - t0)
            t0 = time.perf_counter()
            analyze_airfoil(coords, reynolds=1e6, alpha=14.0)
            logger.info("analysis warmup done in %.1fs",
                        time.perf_counter() - t0)
        except Exception as e:       # pragma: no cover - warmup is best-effort
            logger.warning("solver warmup failed: %s", e)

    threading.Thread(target=_warm, name="solver-warmup",
                     daemon=True).start()


def parse_upload(filename: str, content: bytes):
    """Shared validation + parse path for any endpoint taking a .dat file."""
    if len(content) > config.MAX_FILE_SIZE:
        raise ApiError(400, f"File too large (max "
                            f"{config.MAX_FILE_SIZE / (1024 * 1024)}MB)")
    if not filename.endswith(".dat"):
        raise ApiError(400, "Only .dat files accepted")
    try:
        coords, fixes = parse_dat_text(
            content.decode("utf-8", errors="ignore"))
    except AirfoilParseError as e:
        raise ApiError(e.status_code, e.detail)
    if len(coords) > config.MAX_POINTS:
        raise ApiError(400, f"Too many points (max {config.MAX_POINTS})")
    if is_multi_element(coords):
        raise ApiError(400, "Multi-element airfoil detected — "
                            "single-element analysis only")
    return coords, fixes


def validate_envelope(reynolds: float, alpha: float):
    if not (config.MIN_REYNOLDS <= reynolds <= config.MAX_REYNOLDS):
        raise ApiError(400, f"Reynolds must be {config.MIN_REYNOLDS:,.0f} "
                            f"to {config.MAX_REYNOLDS:,.0f}")
    if not (config.MIN_ALPHA <= alpha <= config.MAX_ALPHA):
        raise ApiError(400, f"Alpha must be {config.MIN_ALPHA:.0f} to "
                            f"{config.MAX_ALPHA:.0f} degrees")


def handle_root():
    return 200, {"status": "ok", "service": "Airfoil TPU CFD API"}


def handle_health():
    import jax

    try:
        dev = jax.devices()[0]
        backend = dev.platform
        detail = str(dev)
    except Exception as e:  # pragma: no cover
        backend, detail = "none", str(e)
    return 200, {
        "status": "healthy" if backend != "none" else "degraded",
        "solver": "airfoil_tpu",
        "backend": backend,
        "accelerator": backend not in ("cpu", "none"),
        "device": detail,
    }


def _write_run_log(run_id: str, filename: str, reynolds: float,
                   alpha: float, n_coords: int, parser_fixes: list,
                   result, elapsed: float):
    """Per-run solver artifact, the reference's ``xfoil_output.log``
    analog (reference main.py:404-415 dumps params + full XFOIL stdout
    per run as its main debugging affordance). One file per request under
    AIRFOIL_TPU_RUN_LOG_DIR (default /tmp/airfoil_tpu_runs; set empty to
    disable); best-effort, bounded to the newest ~200 files."""
    import os

    log_dir = os.environ.get("AIRFOIL_TPU_RUN_LOG_DIR",
                             "/tmp/airfoil_tpu_runs")
    if not log_dir:
        return
    try:
        os.makedirs(log_dir, exist_ok=True)
        entries = sorted(os.listdir(log_dir))
        for stale in entries[:-200]:
            try:
                os.unlink(os.path.join(log_dir, stale))
            except OSError:
                pass
        path = os.path.join(
            log_dir, f"{time.strftime('%Y%m%d-%H%M%S')}_{run_id}.log")
        with open(path, "w") as f:
            f.write(f"run_id: {run_id}\nfile: {filename}\n"
                    f"reynolds: {reynolds:g}\nalpha: {alpha:g}\n"
                    f"n_coords: {n_coords}\n"
                    f"elapsed_seconds: {elapsed:.3f}\n"
                    f"mode: {result.mode}\nstrategy: {result.strategy}\n"
                    f"converged: {result.converged}\n"
                    f"sep_fraction: {result.sep_fraction:.4f}\n"
                    f"coefficients: {result.coefficients}\n"
                    f"parser_fixes:\n")
            for fix in parser_fixes:
                f.write(f"  - {fix}\n")
            if result.extras:
                f.write(f"extras: {result.extras}\n")
    except Exception as e:           # pragma: no cover - never block a reply
        logger.warning("run log write failed: %s", e)


def handle_upload(filename: str, content: bytes,
                  reynolds: float, alpha: float):
    validate_envelope(reynolds, alpha)
    coords, parser_fixes = parse_upload(filename, content)
    run_id = str(uuid.uuid4())[:8]
    logger.info("request %s: %s Re=%g alpha=%g (%d pts)",
                run_id, filename, reynolds, alpha, len(coords))

    from airfoil_tpu.polar import analyze_airfoil

    t0 = time.perf_counter()
    result = analyze_airfoil(coords, reynolds, alpha)
    elapsed = time.perf_counter() - t0
    logger.info("request %s done in %.3fs (mode=%s strategy=%d)",
                run_id, elapsed, result.mode, result.strategy)
    _write_run_log(run_id, filename, reynolds, alpha, len(coords),
                   parser_fixes, result, elapsed)
    # Result-sanity warnings (reference main.py:499-502 logs the same two
    # checks): a viscous CD below the flat-plate floor at this Re, or an
    # implausibly high L/D, usually means a wrong-basin solve slipped
    # through the convergence gates — flag it in the server log.
    c = result.coefficients
    cd_v = c.get("CD") or 0.0
    cl_v = c.get("CL") or 0.0
    if result.mode == "viscous" and reynolds > 1e5 and 0 < cd_v < 0.005:
        logger.warning("request %s: CD=%.6f suspiciously low "
                       "(expected ~0.007-0.012 at this Re)", run_id, cd_v)
    if cd_v > 0 and abs(cl_v) / cd_v > 150:
        logger.warning("request %s: L/D=%.0f unusually high",
                       run_id, abs(cl_v) / cd_v)
    increment_analysis_count()
    return 200, {
        "success": True,
        "coords_before": coords,
        "coords_after": coords,
        "num_points": len(coords),
        "cp_x": result.cp_x,
        "cp_values": result.cp_values,
        "coefficients": result.coefficients,
        "bl_data": result.bl_data,
        "parser_fixes": parser_fixes,
    }


def handle_polar(filename: str, content: bytes, reynolds: float,
                 alpha_start: float, alpha_end: float, alpha_step: float):
    validate_envelope(reynolds, alpha_start)
    validate_envelope(reynolds, alpha_end)
    if not (0.1 <= alpha_step <= 5.0):
        raise ApiError(400, "alpha_step must be in [0.1, 5]")
    coords, parser_fixes = parse_upload(filename, content)
    alphas = np.arange(alpha_start, alpha_end + 1e-6, alpha_step,
                       dtype=np.float32)
    if len(alphas) > 128:
        raise ApiError(400, "Too many polar points (max 128)")

    from airfoil_tpu.polar import solve_polar

    t0 = time.perf_counter()
    res = solve_polar(np.asarray(coords, np.float32), alphas, reynolds)
    np.asarray(res.cl)  # force completion before timing
    dt = time.perf_counter() - t0
    increment_analysis_count()
    # Strategy reported faithfully per point, matching the single-point
    # path: "viscous_smoothed" is the reference's Strategy 2 (GDES SMOO,
    # main.py:308-313) and the internal enum distinguishes it — flattening
    # it to "viscous" here would hide which points needed the rescue.
    mode_names = {0: "viscous", 1: "viscous_smoothed", 2: "inviscid"}
    return 200, {
        "success": True,
        "num_points": len(coords),
        "parser_fixes": parser_fixes,
        "reynolds": reynolds,
        "elapsed_seconds": round(dt, 4),
        "polar": [
            {
                "alpha": float(res.alpha[i]),
                "CL": round(float(res.cl[i]), 4),
                "CD": round(float(res.cd[i]), 6),
                "CDp": round(float(res.cdp[i]), 6),
                "Cm": round(float(res.cm[i]), 4),
                "mode": mode_names[int(res.mode[i])],
                "converged": bool(res.converged[i]),
                "xtr_upper": round(float(res.xtr_upper[i]), 4),
                "xtr_lower": round(float(res.xtr_lower[i]), 4),
                "sep_fraction": round(float(res.sep_fraction[i]), 4),
            }
            for i in range(len(alphas))
        ],
    }


def handle_batch(files: list, reynolds: float, alpha: float):
    """Batched multi-airfoil analysis: ONE dispatch over geometries.

    ``files``: list of (filename, content) pairs. Replaces the reference's
    sequential per-file loop (pages/Airfoil_Analysis.py:866-923) with a
    single vmapped solve (polar/batch.py).
    """
    validate_envelope(reynolds, alpha)
    if not files:
        raise ApiError(400, "No files uploaded")
    if len(files) > 10:
        raise ApiError(400, "At most 10 files per batch")

    names, coords_list, fixes_list = [], [], []
    errors = {}
    for fname, content in files:
        try:
            coords, fixes = parse_upload(fname, content)
            names.append(fname)
            coords_list.append(np.asarray(coords, np.float32))
            fixes_list.append(fixes)
        except ApiError as e:
            errors[fname] = e.detail

    from airfoil_tpu.polar.batch import solve_batch

    t0 = time.perf_counter()
    rows = []
    if coords_list:
        res = solve_batch(coords_list, reynolds, alpha)
        for i, nm in enumerate(names):
            rows.append({
                "file": nm,
                "CL": round(float(res.cl[i]), 4),
                "CD": round(float(res.cd[i]), 6),
                "CDp": round(float(res.cdp[i]), 6),
                "Cm": round(float(res.cm[i]), 4),
                "converged": bool(res.converged[i]),
                "xtr_upper": round(float(res.xtr_upper[i]), 4),
                "xtr_lower": round(float(res.xtr_lower[i]), 4),
                "parser_fixes": fixes_list[i],
            })
            increment_analysis_count()
    dt = time.perf_counter() - t0
    for nm, detail in errors.items():
        rows.append({"file": nm, "error": detail})
    return 200, {
        "success": True,
        "reynolds": reynolds,
        "alpha": alpha,
        "elapsed_seconds": round(dt, 4),
        "results": rows,
    }


def _b64_field(arr) -> dict:
    a = np.ascontiguousarray(np.asarray(arr, np.float32))
    return {
        "shape": list(a.shape),
        "dtype": "float32",
        "data": base64.b64encode(a.tobytes()).decode("ascii"),
    }


class LBMSessions:
    """Wind-tunnel session registry (thread-safe, bounded)."""

    def __init__(self, max_sessions: int = 8):
        self._lock = threading.Lock()
        self._tunnels: dict[str, object] = {}
        # Per-session locks: frame/set_alpha/set_u0 mutate WindTunnel state
        # (f ping-pong, EMA smoothers, mask swap); two concurrent /lbm/frame
        # posts on one session would interleave dispatches or lose steps on
        # either threaded transport.
        self._session_locks: dict[str, threading.Lock] = {}
        self._max = max_sessions

    def start(self, filename: str, content: bytes, alpha: float):
        coords, _fixes = parse_upload(filename, content)

        from airfoil_tpu.lbm import WindTunnel

        wt = WindTunnel(np.asarray(coords, np.float64))
        wt.set_alpha(alpha)
        session = str(uuid.uuid4())[:8]
        with self._lock:
            while len(self._tunnels) >= self._max:
                dropped = next(iter(self._tunnels))
                self._tunnels.pop(dropped)
                self._session_locks.pop(dropped, None)
            self._tunnels[session] = wt
            self._session_locks[session] = threading.Lock()
        cfg = wt.cfg
        return 200, {
            "session": session,
            "grid": [cfg.ny, cfg.nx],
            "domain": [cfg.dx0, cfg.dx1, cfg.dy0, cfg.dy1],
            "tau": cfg.tau,
            "u0": cfg.u0,
        }

    def frame(self, session: str, alpha=None, u0=None, fields="speed"):
        with self._lock:
            wt = self._tunnels.get(session)
            slock = self._session_locks.get(session)
        if wt is None or slock is None:
            raise ApiError(404, "Unknown session")
        with slock:
            if alpha is not None and abs(alpha - wt.state.alpha) > 1e-6:
                wt.set_alpha(alpha)
            if u0 is not None:
                wt.set_u0(u0)
            out = wt.frame()
        want = set(fields.split(","))
        return 200, {
            "cl": round(out["cl"], 4),
            "cd": round(out["cd"], 4),
            "separation": round(out["separation"], 4),
            "reynolds": round(out["reynolds"], 1),
            "step": out["step"],
            "alpha": out["alpha"],
            "fields": {k: _b64_field(v) for k, v in out["fields"].items()
                       if k in want},
            "outline": np.asarray(out["outline"],
                                  np.float64).round(5).tolist(),
        }

    def stop(self, session: str):
        with self._lock:
            self._tunnels.pop(session, None)
            self._session_locks.pop(session, None)
        return 200, {"stopped": session}


def handle_stats():
    from airfoil_tpu.utils.stats import get_analysis_count

    return 200, {"total_analyses": get_analysis_count()}
