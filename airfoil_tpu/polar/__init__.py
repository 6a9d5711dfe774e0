from airfoil_tpu.polar.sweep import PolarResult, solve_polar, warm_polar_kernels
from airfoil_tpu.polar.analyze import AnalysisResult, analyze_airfoil

__all__ = ["PolarResult", "solve_polar", "warm_polar_kernels", "AnalysisResult", "analyze_airfoil"]
from airfoil_tpu.polar.batch import BatchResult, solve_batch  # noqa: E402

__all__ += ["BatchResult", "solve_batch"]
