from airfoil_tpu.models.naca import naca4, clark_y, SHAPES

__all__ = ["naca4", "clark_y", "SHAPES"]
