from periodicity_spark.functions.expressions import (
    fold_expr,
    series_window,
    sessionize,
    time_bucket,
)
from periodicity_spark.functions.stats import series_stats

__all__ = ["series_window", "fold_expr", "sessionize", "time_bucket", "series_stats"]
