"""periodicity_spark — a PySpark-native periodicity/time-series analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference library ``dioph/periodicity`` (see /root/reference), re-expressed
Spark-first: long-format DataFrames, Catalyst-optimized native expressions,
window functions for order-sensitive ops, and Arrow-vectorized pandas UDFs
only where the math is irreducibly sequential (FFT, splines, sifting loops).

Data model (see SURVEY.md §1):
  ts    (series_id string, time double, value double [, dy double])
  pg    (series_id string, frequency double, power double)
  tf    (series_id string, time double, frequency double, power double)
  modes (series_id string, mode int, time double, value double)
"""

from periodicity_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
