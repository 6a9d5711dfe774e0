"""LBM throughput benchmark (MLUPS).

The reference's implied rate is ~12.3 MLUPS (320x160 grid x 4 steps/frame
at 60 fps in browser WebGL2, SURVEY.md section 6); the north-star target is
>= 500 MLUPS server-side.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from airfoil_tpu.config import LBMConfig
from airfoil_tpu.lbm.core import equilibrium_init, lbm_step
from airfoil_tpu.lbm.kernel import lbm_steps_pallas
from airfoil_tpu.lbm.masks import rasterize_airfoil

__all__ = ["bench_mlups"]


def bench_mlups(nx: int = 640, ny: int = 384, steps_per_call: int = 128,
                n_calls: int = 8, use_pallas: bool | None = None) -> dict:
    """Peak-throughput configuration: the largest lattice whose two
    (9, NY, NX) f32 buffers stay VMEM-resident (~8.8 MB each) with enough
    fused steps per dispatch to amortise the launch latency. The
    interactive wind-tunnel grid (384x192, LBMConfig default) runs the
    same kernel at lower MLUPS because each frame is latency- not
    throughput-bound.

    steps_per_call matters through the TUNNELED backend: each dispatch
    pays ~3 ms of RPC latency (measured v5e-over-axon, 2026-08), while the
    kernel's marginal cost is ~42-47 us/step at 640x384 — at 64 fused
    steps/call the dispatch overhead eats ~half the throughput (the
    round-1 -> round-3 bench "regression" 3041 -> 2597 MLUPS was latency
    variance of exactly this term, not a kernel change). 128 steps/call
    amortises it to <10%; see docs/VALIDATION.md for the roofline."""
    from airfoil_tpu.models import naca4

    cfg = LBMConfig(nx=nx, ny=ny)
    mask = jnp.asarray(rasterize_airfoil(naca4(2, 4, 12, 50), 6.0, cfg))
    f = equilibrium_init(ny, nx, cfg.u0)

    if use_pallas is None:
        aligned = nx % 128 == 0 and ny % 8 == 0
        fits_vmem = 2 * 9 * nx * ny * 4 <= 20_000_000
        use_pallas = (jax.devices()[0].platform != "cpu" and aligned
                      and fits_vmem)

    def run(fc):
        if use_pallas:
            return lbm_steps_pallas(fc, mask, cfg.u0, cfg.tau,
                                    steps=steps_per_call)
        return lbm_step(fc, mask, cfg.u0, cfg.tau, steps=steps_per_call)

    from airfoil_tpu.utils.profiling import device_sync

    f = run(f)
    device_sync(f)

    t0 = time.perf_counter()
    for _ in range(n_calls):
        f = run(f)
    device_sync(f)  # forced fetch: block_until_ready can lie on tunneled backends
    dt = time.perf_counter() - t0

    site_updates = nx * ny * steps_per_call * n_calls
    mlups = site_updates / dt / 1e6
    finite = bool(jnp.all(jnp.isfinite(f)))
    return {
        "mlups": mlups,
        "grid": f"{nx}x{ny}",
        "steps": steps_per_call * n_calls,
        "pallas": bool(use_pallas),
        "finite": finite,
    }
