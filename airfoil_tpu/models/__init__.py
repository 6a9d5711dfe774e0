from airfoil_tpu.models.naca import naca4, clark_y, SHAPES
from airfoil_tpu.models.joukowski import joukowski, joukowski_exact

__all__ = ["naca4", "clark_y", "SHAPES", "joukowski", "joukowski_exact"]
