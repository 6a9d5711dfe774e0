"""Batched multi-airfoil analysis: one dispatch over geometries.

The reference's batch mode loops sequentially over <= 10 uploaded files,
one full HTTP+XFOIL round-trip each (pages/Airfoil_Analysis.py:866-923).
Here the geometry axis is just another vmap dimension: all airfoils
repanel to a common node count and solve together, completing the
(airfoil x alpha x Re) batching tensor of SURVEY.md section 5.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from airfoil_tpu.inviscid import build_operator
from airfoil_tpu.paneling import panel_geometry, repanel
from airfoil_tpu.viscous.newton import solve_polar_point

__all__ = ["BatchResult", "solve_batch"]


class BatchResult(NamedTuple):
    """Per-airfoil arrays, shape (B,)."""

    cl: jnp.ndarray
    cd: jnp.ndarray
    cdp: jnp.ndarray
    cm: jnp.ndarray
    converged: jnp.ndarray
    xtr_upper: jnp.ndarray
    xtr_lower: jnp.ndarray
    sep_fraction: jnp.ndarray


@partial(jax.jit, static_argnames=("n_panels",))
def _batch_kernel(coords_b, alpha, reynolds, n_panels=160):
    def one(coords):
        xp, yp = repanel(coords, n_panels)
        op = build_operator(panel_geometry(xp, yp))
        out, _extra = solve_polar_point(op, alpha, reynolds,
                                        n_stations=96)
        return out

    return jax.vmap(one)(coords_b)


def solve_batch(coords_list, reynolds: float, alpha: float,
                n_panels: int = 160) -> BatchResult:
    """Analyze a batch of airfoils at one (alpha, Re) in one dispatch.

    ``coords_list``: sequence of (M_i, 2) loops (ragged OK — each repanels
    to ``n_panels`` on device; the stack axis is the batch).
    """
    import numpy as np

    fixed = []
    for c in coords_list:
        c = np.asarray(c, np.float32)
        # Pre-resample ragged inputs to a common host-side point count so
        # they stack; the on-device repanel then applies the real
        # LE/TE-clustered spacing.
        if len(fixed) and c.shape[0] != fixed[0].shape[0]:
            n = fixed[0].shape[0]
            t = np.linspace(0.0, 1.0, c.shape[0])
            tq = np.linspace(0.0, 1.0, n)
            c = np.stack([np.interp(tq, t, c[:, 0]),
                          np.interp(tq, t, c[:, 1])], axis=1)
        fixed.append(c)
    coords_b = jnp.asarray(np.stack(fixed), jnp.float32)
    out = _batch_kernel(coords_b, float(alpha), float(reynolds), n_panels)
    return BatchResult(*out)
