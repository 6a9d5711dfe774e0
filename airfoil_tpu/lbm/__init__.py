from airfoil_tpu.lbm.core import (
    D2Q9_E,
    D2Q9_W,
    D2Q9_OPP,
    equilibrium_init,
    lbm_step,
)
from airfoil_tpu.lbm.masks import rasterize_airfoil, build_mask
from airfoil_tpu.lbm.diagnostics import forces_and_separation, render_fields
from airfoil_tpu.lbm.runner import LBMState, WindTunnel
from airfoil_tpu.lbm.kernel import lbm_steps_pallas
from airfoil_tpu.lbm.bench import bench_mlups
from airfoil_tpu.lbm.sharded import dryrun_sharded_step, sharded_lbm_steps

__all__ = [
    "D2Q9_E", "D2Q9_W", "D2Q9_OPP",
    "equilibrium_init", "lbm_step",
    "rasterize_airfoil", "build_mask",
    "forces_and_separation", "render_fields",
    "LBMState", "WindTunnel",
    "lbm_steps_pallas",
    "bench_mlups",
    "dryrun_sharded_step", "sharded_lbm_steps",
]
