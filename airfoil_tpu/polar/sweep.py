"""Batched polar sweeps: one TPU dispatch per whole polar.

The reference computes an N-point polar as N sequential HTTP+XFOIL
round-trips (pages/Airfoil_Analysis.py:938-968 — "the hot loop"), each
costing seconds to 90 s. Here the (alpha, Re) grid is a single ``vmap`` of
the coupled viscous solve, and the reference's three-strategy fallback
(viscous -> viscous+smoothed geometry -> inviscid, run_xfoil_sync at
main.py:284-325) becomes a batched masked selection: all three strategies
are evaluated for every point (they are one vmap each) and each point takes
the first converged one, tagging ``mode`` exactly like the reference tags
``coefficients["mode"]`` (main.py:504-506).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from airfoil_tpu.inviscid import build_operator, solve_inviscid
from airfoil_tpu.paneling import panel_geometry, repanel, smooth_geometry
from airfoil_tpu.viscous.newton import (
    solve_polar_point,
    solve_polar_point_cont,
)

__all__ = ["PolarResult", "solve_polar", "MODE_VISCOUS",
           "MODE_VISCOUS_SMOOTHED", "MODE_INVISCID"]

MODE_VISCOUS = 0
MODE_VISCOUS_SMOOTHED = 1
MODE_INVISCID = 2


class PolarResult(NamedTuple):
    """Per-point polar arrays; all shapes (P,) for P (alpha, Re) pairs."""

    alpha: jnp.ndarray
    reynolds: jnp.ndarray
    cl: jnp.ndarray
    cd: jnp.ndarray
    cdp: jnp.ndarray
    cm: jnp.ndarray
    mode: jnp.ndarray          # int: 0 viscous / 1 smoothed / 2 inviscid
    converged: jnp.ndarray     # bool: any strategy converged (2 always does)
    xtr_upper: jnp.ndarray
    xtr_lower: jnp.ndarray
    sep_fraction: jnp.ndarray


@partial(jax.jit, static_argnames=("n_panels",))
def _polar_kernel(coords, alphas, reynolds, n_panels=160):
    """The single-dispatch polar: all three strategies, batched."""
    xp, yp = repanel(coords, n_panels)
    pan = panel_geometry(xp, yp)
    op = build_operator(pan)

    xs, ys = smooth_geometry(xp, yp)
    op_s = build_operator(panel_geometry(xs, ys))

    # Strategies 1 + 2 in ONE doubled batch (clean + smoothed operators
    # stacked on a leading axis — the solve is latency-bound, so the
    # smoothed-geometry rescue rides along nearly free). Each point runs
    # the simultaneous-Newton solve (XFOIL-class accuracy) with the
    # warm-start direct trajectory as its in-kernel fallback.
    ops2 = jax.tree.map(lambda a, b: jnp.stack([a, b]), op, op_s)
    out12 = jax.vmap(
        lambda o: jax.vmap(
            lambda a, re: solve_polar_point(o, a, re, n_stations=64)
        )(alphas, reynolds)
    )(ops2)
    v12, extra12 = out12
    v1 = jax.tree.map(lambda a: a[0], v12)
    v2 = jax.tree.map(lambda a: a[1], v12)

    # Continuation pass: points whose Newton solve missed (typically the
    # high-alpha tail near stall, where the warm march is a poor starting
    # basin) re-solve from the nearest converged neighbour's state — the
    # alpha-continuation XFOIL users do by sweeping from low alpha.
    newton_ok = extra12[0][0]                   # clean-op Newton flags (P,)
    states = jax.tree.map(lambda a: a[0], extra12[1])
    dist = jnp.abs(alphas[:, None] - alphas[None, :])
    dist = dist + jnp.where(newton_ok[None, :], 0.0, 1e6)
    donor = jnp.argmin(dist, axis=1)            # nearest converged point
    donor_state = jax.tree.map(lambda a: jnp.take(a, donor, axis=0), states)
    any_ok = jnp.any(newton_ok)
    all_ok = jnp.all(newton_ok)

    def run_cont(_):
        return jax.vmap(
            lambda a, re, zz, xu, xl: solve_polar_point_cont(
                op, a, re, zz, xu, xl, n_stations=64)
        )(alphas, reynolds, *donor_state)

    def skip_cont(_):
        return v1

    # The continuation pass only executes when some point actually needs
    # it (lax.cond: the common easy-polar case pays nothing).
    needs_cont = jnp.logical_and(jnp.logical_not(all_ok), any_ok)
    vc = jax.lax.cond(needs_cont, run_cont, skip_cont, operand=None)
    # Adopt the continuation result only where pass 1's Newton missed, the
    # continuation converged, and a donor existed at all.
    adopt = jnp.logical_and(jnp.logical_not(newton_ok),
                            jnp.logical_and(vc[4], needs_cont))
    v1 = tuple(jnp.where(adopt, c, p1) for c, p1 in zip(vc, v1))

    def inv(a):
        r = solve_inviscid(op, a)
        return r.cl, r.cm
    cl3, cm3 = jax.vmap(inv)(alphas)

    use1 = v1[4]
    use2 = jnp.logical_and(jnp.logical_not(use1), v2[4])
    use3 = jnp.logical_not(jnp.logical_or(use1, use2))

    def pick(i1, i2, i3):
        return jnp.where(use1, i1, jnp.where(use2, i2, i3))

    one = jnp.ones_like(alphas)
    cl = pick(v1[0], v2[0], cl3)
    cd = pick(v1[1], v2[1], 0.0 * one)      # inviscid: CD unrealistically 0
    cdp = pick(v1[2], v2[2], 0.0 * one)
    cm = pick(v1[3], v2[3], cm3)
    xtru = pick(v1[5], v2[5], one)
    xtrl = pick(v1[6], v2[6], one)
    sep = pick(v1[7], v2[7], 0.0 * one)
    mode = jnp.where(use1, MODE_VISCOUS,
                     jnp.where(use2, MODE_VISCOUS_SMOOTHED, MODE_INVISCID))
    converged = jnp.logical_or(use1, jnp.logical_or(use2, use3))
    return cl, cd, cdp, cm, mode, converged, xtru, xtrl, sep


def solve_polar(
    coords,
    alphas,
    reynolds,
    n_panels: int = 160,
) -> PolarResult:
    """Run a whole polar in one dispatch.

    ``alphas`` and ``reynolds`` are broadcast against each other: pass a
    scalar Re with an alpha vector for a classic polar, or equal-length
    vectors for a general (alpha, Re) set, or use ``jnp.meshgrid`` +
    ``ravel`` upstream for the full product grid.
    """
    coords = jnp.asarray(coords, jnp.float32)
    alphas = jnp.atleast_1d(jnp.asarray(alphas, jnp.float32))
    reynolds = jnp.broadcast_to(
        jnp.asarray(reynolds, jnp.float32), alphas.shape)
    cl, cd, cdp, cm, mode, conv, xtru, xtrl, sep = _polar_kernel(
        coords, alphas, reynolds, n_panels)
    return PolarResult(alphas, reynolds, cl, cd, cdp, cm, mode, conv,
                       xtru, xtrl, sep)
