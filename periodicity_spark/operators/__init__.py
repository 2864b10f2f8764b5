from periodicity_spark.operators import agg, clean, resample, transform, windows
from periodicity_spark.operators.acf import acf_lag_grid

__all__ = ["agg", "clean", "resample", "transform", "windows", "acf_lag_grid"]
