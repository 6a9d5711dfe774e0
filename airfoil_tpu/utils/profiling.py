"""Per-stage timing utilities.

The reference has no profiling at all (SURVEY.md section 5 — its only
latency signal is XFOIL subprocess timeouts). Here every service path can
record device-synchronised stage timings, and the JAX profiler can be
engaged around any block for deep traces.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax

__all__ = ["Timings", "stage_timer", "profile_trace", "device_sync"]


def device_sync(x=None):
    """Force completion of all queued device work.

    ``block_until_ready`` is unreliable on tunneled/remote PJRT backends
    (it can return at dispatch time); fetching a scalar that depends on the
    value is the only sync that provably waits. Pass the newest array in
    the dependency chain.
    """
    import jax.numpy as jnp

    if x is None:
        x = jax.device_put(0.0)
    leaves = jax.tree.leaves(x)
    acc = 0.0
    for leaf in leaves[:1]:
        acc = float(jnp.sum(jnp.ravel(leaf)[:1]))
    return acc


@dataclass
class Timings:
    stages: dict = field(default_factory=dict)

    def record(self, name: str, seconds: float):
        self.stages[name] = self.stages.get(name, 0.0) + seconds

    def as_dict(self, ndigits: int = 4) -> dict:
        return {k: round(v, ndigits) for k, v in self.stages.items()}


@contextlib.contextmanager
def stage_timer(timings: Timings, name: str, sync: bool = True):
    """Time a block; optionally block on outstanding device work first."""
    if sync:
        (jax.device_put(0.0) + 0).block_until_ready()
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync:
            (jax.device_put(0.0) + 0).block_until_ready()
        timings.record(name, time.perf_counter() - t0)


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/airfoil_tpu_trace"):
    """JAX profiler trace around a block (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
