from airfoil_tpu.viscous.march import BLState, march_side, stagnation_ic
from airfoil_tpu.viscous.coupled import ViscousResult, solve_viscous
from airfoil_tpu.viscous.newton import (
    solve_polar_point,
    solve_polar_point_cont,
    solve_viscous_newton,
)

__all__ = [
    "BLState",
    "march_side",
    "stagnation_ic",
    "ViscousResult",
    "solve_viscous",
    "solve_viscous_newton",
    "solve_polar_point",
    "solve_polar_point_cont",
]
