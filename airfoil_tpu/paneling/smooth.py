"""Geometry smoothing — the TPU-native replacement for XFOIL ``GDES SMOO``.

The reference's second fallback strategy reruns XFOIL after smoothing the
geometry (main.py:305-313, script lines GDES/SMOO at main.py:355-358), which
rescues noisy or kinked coordinate files. Here the same role is played by a
shrinkage-free Taubin (lambda | mu) Laplacian filter applied to the repaneled
loop with the trailing-edge endpoints pinned, so the repaired shape feeds the
same panel solver.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["smooth_geometry"]


def smooth_geometry(
    xp: jnp.ndarray,
    yp: jnp.ndarray,
    passes: int = 10,
    lam: float = 0.5,
    mu: float = -0.52,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Taubin-smooth an open node chain (TE ... TE), endpoints fixed.

    Each pass applies an inflation step (``lam``) followed by a deflation
    step (``mu``) of the umbrella Laplacian; the pair smooths high-frequency
    wiggles (the convergence killers) without shrinking the section the way
    plain Laplacian smoothing would.
    """
    pts = jnp.stack([xp, yp], axis=1)

    def _step(p: jnp.ndarray, weight: float) -> jnp.ndarray:
        lap = 0.5 * (p[:-2] + p[2:]) - p[1:-1]
        interior = p[1:-1] + weight * lap
        return jnp.concatenate([p[:1], interior, p[-1:]], axis=0)

    def body(_, p):
        return _step(_step(p, lam), mu)

    pts = jax.lax.fori_loop(0, passes, body, pts)
    return pts[:, 0], pts[:, 1]
