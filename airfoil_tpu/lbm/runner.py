"""Server-side wind tunnel: state management + per-frame stepping.

The TPU-native replacement for the reference's browser render loop
(pages/airfoil_flow_lbm_aerolab.html:899-930: 4 sim steps -> render ->
readback -> forces every 3 frames). Here a frame is one device dispatch
(Pallas when the grid is tile-aligned, XLA otherwise) followed by fused
force/separation reductions; the API layer streams the resulting fields to
the browser instead of running GLSL client-side.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from airfoil_tpu.config import LBMConfig, DEFAULT_LBM
from airfoil_tpu.lbm.core import equilibrium_init, lbm_step
from airfoil_tpu.lbm.diagnostics import forces_and_separation, render_fields
from airfoil_tpu.lbm.kernel import lbm_steps_pallas, lbm_steps_pallas_tiled
from airfoil_tpu.lbm.masks import build_mask

__all__ = ["LBMState", "WindTunnel"]


@dataclass
class LBMState:
    f: jnp.ndarray
    solid: jnp.ndarray
    outline: np.ndarray
    alpha: float
    u0: float
    step_count: int = 0


@dataclass
class WindTunnel:
    """One simulation session (one uploaded geometry).

    EMA smoothing of CL/CD (0.9/0.1) and separation (0.85/0.15) matches the
    reference's stats loop (html:659-662,699).
    """

    coords: np.ndarray
    cfg: LBMConfig = field(default_factory=lambda: DEFAULT_LBM)
    use_pallas: bool | None = None
    state: LBMState | None = None
    cl_smooth: float | None = None
    cd_smooth: float | None = None
    sep_smooth: float = 0.0

    tiled: bool = False

    def __post_init__(self):
        self.coords = np.asarray(self.coords, np.float64)
        if self.use_pallas is None:
            on_tpu = jax.devices()[0].platform != "cpu"
            aligned = (self.cfg.nx % 128 == 0) and (self.cfg.ny % 8 == 0)
            # Path selection: VMEM-resident kernel when two (9, NY, NX) f32
            # stacks fit on-chip; the row-strip halo kernel (HBM-resident,
            # same step fusion) for larger tile-aligned grids; plain XLA
            # otherwise.
            fits_vmem = 2 * 9 * self.cfg.nx * self.cfg.ny * 4 <= 20_000_000
            tileable = (aligned and self.cfg.ny % 32 == 0
                        and self.cfg.ny >= 48)
            self.use_pallas = on_tpu and (fits_vmem and aligned or tileable)
            self.tiled = on_tpu and tileable and not (fits_vmem and aligned)
        self.reset(alpha=6.0, u0=self.cfg.u0)

    def reset(self, alpha: float, u0: float | None = None):
        u0 = self.cfg.u0 if u0 is None else u0
        mask, outline = build_mask(self.coords, alpha, self.cfg)
        f = equilibrium_init(self.cfg.ny, self.cfg.nx, u0)
        self.state = LBMState(
            f=f, solid=jnp.asarray(mask), outline=outline,
            alpha=alpha, u0=u0)
        self.cl_smooth = None
        self.cd_smooth = None
        self.sep_smooth = 0.0

    def set_alpha(self, alpha: float):
        """Re-rasterise the mask, keep the flow state (reference behaviour:
        geometry change swaps the mask texture only, html:579-586)."""
        st = self.state
        mask, outline = build_mask(self.coords, alpha, self.cfg)
        st.solid = jnp.asarray(mask)
        st.outline = outline
        st.alpha = alpha

    def set_u0(self, u0: float):
        self.state.u0 = float(u0)

    def frame(self, steps: int | None = None) -> dict:
        """Advance one frame; return stats + field arrays."""
        st = self.state
        steps = self.cfg.steps_per_frame if steps is None else steps
        if self.use_pallas and self.tiled:
            st.f = lbm_steps_pallas_tiled(st.f, st.solid, st.u0,
                                          self.cfg.tau, steps=steps)
        elif self.use_pallas:
            st.f = lbm_steps_pallas(st.f, st.solid, st.u0, self.cfg.tau,
                                    steps=steps)
        else:
            st.f = lbm_step(st.f, st.solid, st.u0, self.cfg.tau, steps=steps)
        st.step_count += steps

        cl, cd, sep = forces_and_separation(
            st.f, st.solid, st.u0, self.cfg.chord_cells)
        cl, cd, sep = float(cl), float(cd), float(sep)
        self.cl_smooth = cl if self.cl_smooth is None else \
            0.9 * self.cl_smooth + 0.1 * cl
        self.cd_smooth = cd if self.cd_smooth is None else \
            0.9 * self.cd_smooth + 0.1 * cd
        self.sep_smooth = 0.85 * self.sep_smooth + 0.15 * sep

        speed, cp, vort, ux, uy = render_fields(st.f, st.solid, st.u0)
        return {
            "cl": self.cl_smooth,
            "cd": max(self.cd_smooth, 0.0),
            "separation": self.sep_smooth,
            "reynolds": st.u0 * self.cfg.chord_cells / self.cfg.nu,
            "step": st.step_count,
            "alpha": st.alpha,
            "fields": {
                "speed": speed, "cp": cp, "vorticity": vort,
                "ux": ux, "uy": uy,
            },
            "outline": st.outline,
        }
