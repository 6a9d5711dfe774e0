"""Multi-chip sharding for polar sweeps.

The reference has no distributed dimension at all (SURVEY.md section 2:
its only concurrency is a 3-slot subprocess semaphore). The TPU-native
scaling axis is the (alpha, Re, airfoil) polar tensor: points are
embarrassingly parallel, so they shard data-parallel over a 1-D
``jax.sharding.Mesh``.

Sharding layout: points are sorted by alpha and split into CONTIGUOUS
alpha segments, one per device (``shard_map``). Each device runs its own
batched per-point pass AND its own continuation walk over its local
segment — the walk's sequential scan never crosses a shard boundary, so
there is no cross-device serialisation on the hot path; ICI only touches
the final gather. The price is physics locality: a shard deep in the
stall region has no attached-flow seed of its own, so its walk re-anchors
on its best local per-point result instead of continuing from a
neighbouring shard's donor state (a cross-shard hand-off would serialise
the devices again, defeating the parallelism). Those few extra failures
fall through to the inviscid fill exactly like the single-chip
three-strategy driver.

The LBM grid has a second, spatial axis (see ``airfoil_tpu.lbm``) for
domain decomposition with halo exchange.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from airfoil_tpu.inviscid import solve_inviscid
from airfoil_tpu.polar.sweep import (
    _N_STATIONS,
    _op_kernel,
    _op_kernel_smoothed,
    _walk,
    MODE_INVISCID,
    MODE_VISCOUS,
    MODE_VISCOUS_SMOOTHED,
)
from airfoil_tpu.viscous.newton import solve_polar_point

__all__ = ["batch_mesh", "shard_polar_inputs", "sharded_polar"]


def batch_mesh(devices=None) -> Mesh:
    """A 1-D data-parallel mesh over all (or the given) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, ("batch",))


def shard_polar_inputs(mesh: Mesh, alphas, reynolds):
    """Sort by alpha, pad to a device multiple, place on the mesh.

    Sorting first makes each device's block a contiguous alpha segment —
    the layout the per-shard walk needs. Returns (alphas, reynolds, pad,
    unsort) where ``unsort`` maps sorted order back to the caller's.
    """
    alphas = np.atleast_1d(np.asarray(alphas, np.float32))
    reynolds = np.broadcast_to(
        np.asarray(reynolds, np.float32), alphas.shape)
    order = np.argsort(alphas, kind="stable")
    alphas = alphas[order]
    reynolds = reynolds[order]
    n_dev = mesh.devices.size
    pad = (-alphas.shape[0]) % n_dev
    if pad:
        alphas = np.concatenate([alphas, np.repeat(alphas[-1:], pad)])
        reynolds = np.concatenate([reynolds, np.repeat(reynolds[-1:], pad)])
    unsort = np.argsort(order, kind="stable")
    sharding = NamedSharding(mesh, P("batch"))
    return (jax.device_put(jnp.asarray(alphas), sharding),
            jax.device_put(jnp.asarray(reynolds), sharding),
            pad, unsort)


def _local_points(op, alphas, reynolds):
    """One device's batched per-point pass over its local alpha block."""
    return jax.vmap(
        lambda a, re_: solve_polar_point(op, a, re_,
                                         n_stations=_N_STATIONS)
    )(alphas, reynolds)


def _local_walk(op, alphas, reynolds, m1, nok1, st1):
    """One device's continuation walk + inviscid fill + selection.

    ``alphas`` here is the device-local block (already sorted ascending).
    Returns the selected per-point tuple plus the strategy-1 acceptance
    mask (the smoothed rescue and final mode selection run in their own
    dispatch).
    """
    p_local = alphas.shape[0]
    pos0 = jnp.argmin(jnp.abs(alphas))
    pos = jnp.arange(p_local)
    a_seq = jnp.concatenate([alphas, alphas[::-1]])
    re_seq = jnp.concatenate([reynolds, reynolds[::-1]])
    active = jnp.concatenate([pos >= pos0, jnp.ones_like(pos, bool)])
    seg_start = jnp.zeros((2 * p_local,), bool).at[p_local].set(True)
    m1_seq = jax.tree.map(lambda x: jnp.concatenate([x, x[::-1]]), m1)
    nok1_seq = jnp.concatenate([nok1, nok1[::-1]])
    st1_seq = jax.tree.map(lambda x: jnp.concatenate([x, x[::-1]]), st1)
    state_like = jax.tree.map(lambda x: x[0], st1)

    # Direction- and side-dependent donor-ceiling slack, mirroring
    # _walk_kernel: the advancing side (upper on the ascent, lower on
    # the descent) is pinned to its donor front; the retreating side
    # keeps aft mobility.
    f32_ = alphas.dtype

    def _seq(up_val, dn_val):
        return jnp.concatenate([jnp.full((p_local,), up_val, f32_),
                                jnp.full((p_local,), dn_val, f32_)])

    slack_seq = (_seq(0.0, 0.15), _seq(0.0, 0.5),
                 _seq(0.15, 0.0), _seq(0.5, 0.0))

    # Inviscid fill computed BEFORE the walk: the monotone-deficit audit
    # needs each point's inviscid CL (mirrors _walk_kernel).
    def inv_point(a):
        r = solve_inviscid(op, a)
        return r.cl, r.cm
    cl3, cm3 = jax.vmap(inv_point)(alphas)
    cli_seq = jnp.concatenate([cl3, cl3[::-1]])

    m_walk, used = _walk(op, a_seq, re_seq, active, seg_start, cli_seq,
                         slack_seq, m1_seq, nok1_seq, st1_seq, state_like)
    m_up = jax.tree.map(lambda x: x[:p_local], m_walk)
    m_dn = jax.tree.map(lambda x: x[p_local:][::-1], m_walk)
    used_up = used[:p_local]
    used_dn = used[p_local:][::-1]

    def sel(a, b):
        pr = jnp.reshape(used_up, used_up.shape + (1,) * (a.ndim - 1))
        return jnp.where(pr, a, b)

    v1 = jax.tree.map(sel, m_up, m_dn)
    use1 = jnp.logical_and(v1[4], jnp.logical_or(used_up, used_dn))
    return v1, use1, cl3, cm3


def _local_rescue(op_s, alphas, reynolds, use1):
    """Strategy 2 on one device's block: ANY local failure triggers a full
    local smoothed-geometry pass (``lax.cond`` skips it on clean shards —
    the cost model of the single-chip rescue bucket, per shard). This
    restores the reference's three-strategy contract on the sharded path
    (run_xfoil_sync's GDES SMOO retry, main.py:308-313), which the round-3
    layout dropped."""
    def run(_):
        out, _extra = jax.vmap(
            lambda a, re_: solve_polar_point(op_s, a, re_,
                                             n_stations=_N_STATIONS)
        )(alphas, reynolds)
        return out

    def skip(_):
        z = jnp.zeros_like(alphas)
        return (z, z, z, z, jnp.zeros(alphas.shape, bool), z, z, z)

    any_fail = jnp.logical_not(jnp.all(use1))
    return jax.lax.cond(any_fail, run, skip, None)


def _select_three_strategy(v1, use1, v2, cl3, cm3):
    """Final masked three-strategy precedence (viscous -> smoothed ->
    inviscid), elementwise — mirrors the single-chip ``_polar_kernel``
    tail."""
    use2 = jnp.logical_and(jnp.logical_not(use1), v2[4])
    use3 = jnp.logical_not(jnp.logical_or(use1, use2))

    def pick(i1, i2, i3):
        return jnp.where(use1, i1, jnp.where(use2, i2, i3))

    one = jnp.ones_like(cl3)
    cl = pick(v1[0], v2[0], cl3)
    cd = pick(v1[1], v2[1], 0.0 * one)
    cdp = pick(v1[2], v2[2], 0.0 * one)
    cm = pick(v1[3], v2[3], cm3)
    xtru = pick(v1[5], v2[5], one)
    xtrl = pick(v1[6], v2[6], one)
    sep = pick(v1[7], v2[7], 0.0 * one)
    mode = jnp.where(use1, MODE_VISCOUS,
                     jnp.where(use2, MODE_VISCOUS_SMOOTHED, MODE_INVISCID))
    converged = jnp.logical_or(use1, jnp.logical_or(use2, use3))
    return (cl, cd, cdp, cm, mode.astype(jnp.int32), converged,
            xtru, xtrl, sep)


# The sharded pipeline compiles as SEPARATE dispatches (points pass, walk,
# rescue) exactly like the single-chip pipeline in polar/sweep.py — the
# round-3 single mega-kernel tripped XLA's 2-minute slow-compile alarm on
# an 8-device mesh; XLA's optimisation passes are superlinear in module
# size, and each unit here is independently served by the persistent
# compile cache.

@partial(jax.jit, static_argnames=("mesh",))
def _sharded_points_kernel(op, alphas, reynolds, mesh):
    spec_op = jax.tree.map(lambda _: P(), op)
    fn = jax.shard_map(
        _local_points, mesh=mesh,
        in_specs=(spec_op, P("batch"), P("batch")),
        out_specs=P("batch"), check_vma=False)
    return fn(op, alphas, reynolds)


@partial(jax.jit, static_argnames=("mesh",))
def _sharded_walk_kernel(op, alphas, reynolds, m1, nok1, st1, mesh):
    # check_vma off: the walk's scan carries initialise from unvarying
    # constants (False/zeros) and become device-varying on the first
    # accepted point — semantically fine (everything here is per-shard
    # local with no collectives), but the VMA consistency check would
    # demand pcast noise through the shared _walk code.
    spec_op = jax.tree.map(lambda _: P(), op)
    spec_b = P("batch")
    fn = jax.shard_map(
        _local_walk, mesh=mesh,
        in_specs=(spec_op, spec_b, spec_b,
                  jax.tree.map(lambda _: spec_b, m1), spec_b,
                  jax.tree.map(lambda _: spec_b, st1)),
        out_specs=(jax.tree.map(lambda _: spec_b, m1), spec_b,
                   spec_b, spec_b),
        check_vma=False)
    return fn(op, alphas, reynolds, m1, nok1, st1)


@partial(jax.jit, static_argnames=("mesh",))
def _sharded_rescue_kernel(op_s, alphas, reynolds, use1, mesh):
    spec_op = jax.tree.map(lambda _: P(), op_s)
    fn = jax.shard_map(
        _local_rescue, mesh=mesh,
        in_specs=(spec_op, P("batch"), P("batch"), P("batch")),
        out_specs=P("batch"), check_vma=False)
    return fn(op_s, alphas, reynolds, use1)


@jax.jit
def _select_kernel(v1, use1, v2, cl3, cm3):
    return _select_three_strategy(v1, use1, v2, cl3, cm3)


def sharded_polar(mesh: Mesh, coords, alphas, reynolds, n_panels: int = 160):
    """Run a polar with points sharded data-parallel across the mesh.

    Returns the same tuple as the single-chip polar kernel (in the
    caller's point order, padding stripped). Pipeline of four separately
    compiled dispatches; the only host round-trip is the per-shard
    failure mask (to skip compiling/dispatching the rescue on clean
    polars — the single-chip pipeline's exact structure).
    """
    coords = jnp.asarray(np.asarray(coords, np.float32))
    a_sh, re_sh, pad, unsort = shard_polar_inputs(mesh, alphas, reynolds)
    replicated = NamedSharding(mesh, P())
    op, _xp, _yp = _op_kernel(jax.device_put(coords, replicated), n_panels)
    m1, (nok1, st1) = _sharded_points_kernel(op, a_sh, re_sh, mesh)
    v1, use1, cl3, cm3 = _sharded_walk_kernel(
        op, a_sh, re_sh, m1, nok1, st1, mesh)

    if bool(np.asarray(jnp.all(use1))):
        zeros = jax.tree.map(jnp.zeros_like, v1)
        v2 = zeros[:4] + (jnp.zeros(use1.shape, bool),) + zeros[5:]
    else:
        op_s = _op_kernel_smoothed(
            jax.device_put(coords, replicated), n_panels)
        v2 = _sharded_rescue_kernel(op_s, a_sh, re_sh, use1, mesh)
    out = _select_kernel(v1, use1, v2, cl3, cm3)
    out = tuple(np.asarray(o) for o in out)
    if pad:
        out = tuple(o[:-pad] for o in out)
    return tuple(o[unsort] for o in out)
