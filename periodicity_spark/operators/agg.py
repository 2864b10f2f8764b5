"""Per-series reductions (SURVEY.md §2.4). All NaN/NULL-skipping, matching the
reference's np.nan* reducers (core.py:202-260) given NaN→NULL ingestion.
Dimension routing (reduce over time → frequency-indexed result and vice
versa, reference core.py:128-142) falls out of the groupBy key choice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def reduce_series(ts: DataFrame, *aggs: Column) -> DataFrame:
    return ts.groupBy("series_id").agg(*aggs)


def basic_stats(ts: DataFrame) -> DataFrame:
    """sum/mean/median/std/var/min/max/count in one shuffle."""
    return reduce_series(
        ts,
        F.sum("value").alias("sum"),
        F.avg("value").alias("mean"),
        F.median("value").alias("median"),
        F.stddev_pop("value").alias("std"),
        F.var_pop("value").alias("var"),
        F.stddev_samp("value").alias("std_ddof1"),
        F.var_samp("value").alias("var_ddof1"),
        F.min("value").alias("amin"),
        F.max("value").alias("amax"),
        F.count("value").alias("count"),
    )


def quantiles(ts: DataFrame, probs: list[float] | None = None) -> DataFrame:
    """Exact per-series quantiles (linear interpolation between closest
    ranks — the numpy/np.percentile convention the reference's float
    reducers imply, and DuckDB's quantile_cont). One shuffle, JVM-side
    ``percentile`` aggregate; one output column per requested prob.

    Exact (not approx_percentile): the per-series sort this costs is
    bounded by the largest single series, not corpus size — the shuffle
    partitions by series_id. For corpus-scale single-key quantiles at
    100 TB, use approx_percentile instead (sketch-mergeable)."""
    ps = probs if probs is not None else [0.25, 0.5, 0.75]
    aggs = [
        F.percentile("value", F.lit(p)).alias(f"p{int(round(p * 100)):02d}")
        for p in ps
    ]
    return reduce_series(ts, F.count("value").alias("n"), *aggs)


def argmax_rows(ts: DataFrame, coord: str = "time", value: str = "value") -> DataFrame:
    """max()/tmax(): the row (coords + value) at the maximum
    (reference core.py:217-220,521-522) — F.max_by keeps it one aggregate."""
    return reduce_series(
        ts,
        F.max_by(F.col(coord), F.col(value)).alias(coord),
        F.max(value).alias(value),
    )


def argmin_rows(ts: DataFrame, coord: str = "time", value: str = "value") -> DataFrame:
    return reduce_series(
        ts,
        F.min_by(F.col(coord), F.col(value)).alias(coord),
        F.min(value).alias(value),
    )


def cov_corr(a: DataFrame, b: DataFrame) -> DataFrame:
    """cov/corr of two ts aligned on (series_id, time)
    (reference core.py:560-564; alignment = xarray inner join)."""
    joined = a.select("series_id", "time", F.col("value").alias("_x")).join(
        b.select("series_id", "time", F.col("value").alias("_y")),
        ["series_id", "time"],
    )
    return joined.groupBy("series_id").agg(
        F.covar_samp("_x", "_y").alias("cov"),
        F.corr("_x", "_y").alias("corr"),
    )


def polyfit_linear(ts: DataFrame) -> DataFrame:
    """Degree-1 polyfit via closed-form normal equations as aggregates
    (reference core.py:566-570 delegates to np.polyfit). Returns
    (series_id, slope, intercept). Same math as SQL regr_slope/regr_intercept.
    """
    return reduce_series(
        ts,
        # try_divide: a single-sample (or duplicate-timestamp-only) series
        # has zero time variance — the slope is undefined (NULL), not an
        # ANSI stage abort
        F.try_divide(
            F.avg(F.col("time") * F.col("value")) - F.avg("time") * F.avg("value"),
            F.avg(F.col("time") * F.col("time")) - F.avg("time") * F.avg("time"),
        ).alias("slope"),
    ).join(
        reduce_series(ts, F.avg("value").alias("_my"), F.avg("time").alias("_mt")),
        "series_id",
    ).select(
        "series_id",
        "slope",
        (F.col("_my") - F.col("slope") * F.col("_mt")).alias("intercept"),
    )


def hist(ts: DataFrame, lo: float, hi: float, nbins: int) -> DataFrame:
    """Histogram = groupBy(width_bucket) (reference core.py:280-281)."""
    return (
        ts.filter(F.col("value").isNotNull())
        .groupBy(
            "series_id",
            F.width_bucket(F.col("value"), F.lit(lo), F.lit(hi), F.lit(nbins)).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def baseline(ts: DataFrame) -> DataFrame:
    """t_max − t_min (reference core.py:504-506)."""
    return reduce_series(ts, (F.max("time") - F.min("time")).alias("baseline"))


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    day: Column | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Daily cohort retention — the canonical product-analytics rollup: a
    user's cohort is the day of their FIRST event; retention at offset d
    is the fraction of that cohort active (≥1 event) d days later.

    ``day``: an integer day-index expression (any epoch); defaults to
    calendar days of ``ts_col``. An integer index keeps the operator
    immune to timestamp physical-type drift and engine date-dtype
    differences — callers format the index back to dates at the edge.

    Scale shape (events is the 100 TB fact table): the per-(user, day)
    distinct is a map-side-combinable aggregate that collapses raw events
    to user-days BEFORE anything wide happens; the per-user first-day
    aggregate rides a user-keyed shuffle; their join is user-keyed; the
    final (cohort, offset) aggregate is tiny (days²). Cohort sizes join
    back by broadcast — one row per cohort day. No window functions, no
    self-join of the fact table.

    → (cohort long, day_offset long, n_users, cohort_size, retention)."""
    if day is None:
        day = F.datediff(F.to_date(ts_col), F.to_date(F.lit("1970-01-01")))
    day = day.cast("long")
    ev = events.filter(day.isNotNull() & F.col(user_col).isNotNull())
    act = ev.groupBy(F.col(user_col).alias("_u"), day.alias("_day")).agg(F.lit(1))
    first = act.groupBy("_u").agg(F.min("_day").alias("_cohort"))
    joined = act.join(first, "_u").select(
        "_cohort", (F.col("_day") - F.col("_cohort")).alias("day_offset")
    )
    ret = joined.groupBy("_cohort", "day_offset").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    sizes = first.groupBy("_cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        ret.join(F.broadcast(sizes), "_cohort")
        .select(
            F.col("_cohort").alias("cohort"),
            "day_offset",
            "n_users",
            "cohort_size",
            F.round(
                F.col("n_users") / F.col("cohort_size").cast("double"), 6
            ).alias("retention"),
        )
    )
