from airfoil_tpu.inviscid.panel_solver import (
    InviscidOperator,
    InviscidSolution,
    build_operator,
    solve_inviscid,
    velocity_at_points,
)

__all__ = [
    "InviscidOperator",
    "InviscidSolution",
    "build_operator",
    "solve_inviscid",
    "velocity_at_points",
]
