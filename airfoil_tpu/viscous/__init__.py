from airfoil_tpu.viscous.march import BLState, march_side, stagnation_ic
from airfoil_tpu.viscous.coupled import ViscousResult, solve_viscous

__all__ = [
    "BLState",
    "march_side",
    "stagnation_ic",
    "ViscousResult",
    "solve_viscous",
]
