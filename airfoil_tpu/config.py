"""Framework-wide configuration constants and environment variables.

Mirrors the reference service's input envelope and limits so the API layer
stays contract-compatible (reference main.py:39-47 for the constants,
main.py:30,50-56,633 and app.py:34-35 / db_utils.py:5 for the env vars).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

# ── Input envelope (reference main.py:39-45) ────────────────────────────────
MAX_FILE_SIZE = 1 * 1024 * 1024  # 1 MB upload cap
MAX_POINTS = 500                 # max parsed coordinate points
MIN_POINTS = 10                  # min valid coordinate points
MIN_REYNOLDS = 1e4
MAX_REYNOLDS = 1e7
MIN_ALPHA = -10.0                # degrees (API bound)
MAX_ALPHA = 20.0

# ── Solver concurrency (reference main.py:47: asyncio.Semaphore(3)) ─────────
MAX_CONCURRENT_SOLVES = int(os.getenv("AIRFOIL_TPU_MAX_CONCURRENT", "3"))

# ── Env vars (reference main.py:30,633; app.py:34-35; db_utils.py:5) ────────
ALLOWED_ORIGINS = os.getenv("ALLOWED_ORIGINS", "*").split(",")
PORT = int(os.getenv("PORT", "8000"))
BACKEND_URL = os.getenv("BACKEND_URL", "http://localhost:8000")
DATABASE_URL = os.getenv("DATABASE_URL", "")


# ── Solver numerics ─────────────────────────────────────────────────────────
@dataclass(frozen=True)
class SolverConfig:
    """Static-shape numerics configuration for the TPU solver stack.

    Everything here is a Python-level constant at trace time: changing a
    field triggers a recompile, so the defaults are chosen once and shared
    by the service. ``n_panels`` matches the reference's paneling density
    (XFOIL PANE produces ~140-160 nodes, checked at reference main.py:421-428;
    the frontend vortex solver uses N=160, Airfoil_Analysis.py:66).
    """

    n_panels: int = 160          # surface panels (nodes = n_panels + 1)
    n_wake: int = 40             # wake stations for the viscous march
    newton_iters: int = 20       # viscous-inviscid coupling iterations
    station_newton_iters: int = 8  # per-station BL Newton iterations
    n_crit: float = 9.0          # e^N envelope amplification threshold
    dtype: str = "float32"


DEFAULT_SOLVER = SolverConfig()


# ── LBM defaults (reference pages/airfoil_flow_lbm_aerolab.html:76-80) ──────
@dataclass(frozen=True)
class LBMConfig:
    """D2Q9 lattice configuration.

    The reference browser tunnel runs NX=320 x NY=160 at tau=0.58 with 4
    steps/frame (html:76-80). On TPU the lattice lives in VMEM; the default
    server grid keeps the same physical domain and operating point but is
    tile-aligned (NX a lane multiple of 128, NY a sublane multiple of 8) so
    the VMEM-resident Pallas kernel is eligible — no padding is applied, a
    misaligned grid simply dispatches on the XLA path.
    """

    nx: int = 384
    ny: int = 192
    tau: float = 0.58
    u0: float = 0.06
    steps_per_frame: int = 4
    # physical domain (html:70: DX0..DX1 x DY0..DY1)
    dx0: float = -0.42
    dx1: float = 1.42
    dy0: float = -0.46
    dy1: float = 0.46
    # stability clamps (html:344-351)
    u_max: float = 0.35
    rho_min: float = 0.5
    rho_max: float = 2.0

    @property
    def nu(self) -> float:
        return (self.tau - 0.5) / 3.0

    @property
    def chord_cells(self) -> float:
        return self.nx / (self.dx1 - self.dx0)


DEFAULT_LBM = LBMConfig()
