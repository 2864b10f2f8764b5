"""Per-series scalar statistics as one distributed aggregation.

The reference computes baseline / median_dt / dt as eager properties
(core.py:504-519); several operators branch on them (grid derivation in GLS,
spectral.py:88-97; p_min/p_max in PDM, phase.py:167-175). Here they are one
groupBy over the ts table returning a small stats DataFrame, broadcastable
into downstream plans.

``dt`` (uniform spacing) is only defined when sampling is uniform — the
reference raises otherwise (core.py:512-519). We carry ``is_uniform`` as a
boolean computed with the same tolerance (isclose on diffs vs median diff)
and let callers assert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RTOL = 1e-05
_ATOL = 1e-08


def series_stats(ts: DataFrame) -> DataFrame:
    """→ (series_id, n, n_value, mean, std, vmin, vmax, tmin, tmax,
          baseline, median_dt, is_uniform, dt)"""
    # window lag + isclose condition as SQL strings parsed JVM-side (the
    # Column build cost ~280 ms of py4j round-trips per plan, guide §5);
    # literal positions mirror Python's reflected operators so the trees
    # match the former Column build exactly (optimizedPlan-diffed on every
    # series_stats-consuming declared query)
    diffs = ts.selectExpr(
        "series_id",
        "time",
        "value",
        "time - lag(time) OVER (PARTITION BY series_id ORDER BY time) AS dt_i",
    )
    # median_dt first, then a second pass for the numpy.isclose-style
    # uniformity check: |dt_i − m| ≤ atol + rtol·|m| for every gap.
    med = diffs.groupBy("series_id").agg(F.median("dt_i").alias("median_dt"))
    uni = (
        diffs.join(med, "series_id")
        .groupBy("series_id")
        .agg(
            F.expr(
                "bool_and(dt_i IS NULL OR abs(dt_i - median_dt)"
                f" <= abs(median_dt) * {_RTOL!r}D + {_ATOL!r}D) AS is_uniform"
            )
        )
    )
    base = ts.groupBy("series_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("value").alias("n_value"),
        F.avg("value").alias("mean"),
        F.stddev_samp("value").alias("std"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.min("time").alias("tmin"),
        F.max("time").alias("tmax"),
    )
    out = (
        base.join(med, "series_id", "left")
        .join(uni, "series_id", "left")
        .withColumn("baseline", F.col("tmax") - F.col("tmin"))
        .withColumn("dt", F.when(F.col("is_uniform"), F.col("median_dt")))
    )
    return out.select(
        "series_id", "n", "n_value", "mean", "std", "vmin", "vmax",
        "tmin", "tmax", "baseline", "median_dt", "is_uniform", "dt",
    )


def pg_stats(pg: DataFrame) -> DataFrame:
    """Per-series FSeries accessors as one aggregation (reference
    core.py:913-942): → (series_id, fmax, pmax, median_df, median_dp,
    is_uniform_f, df). ``fmax``/``pmax`` are the frequency/period at max
    power; ``median_df``/``median_dp`` the median grid steps (dp negated
    like the reference, since period decreases as frequency increases);
    ``df`` is NULL when the frequency grid is non-uniform (the reference
    raises — callers assert on is_uniform_f)."""
    w = Window.partitionBy("series_id").orderBy("frequency")
    wall = Window.partitionBy("series_id")
    diffs = pg.select(
        "series_id",
        "frequency",
        "power",
        (F.col("frequency") - F.lag("frequency").over(w)).alias("df_i"),
        ((1.0 / F.col("frequency")) - (1.0 / F.lag("frequency").over(w))).alias("dp_i"),
    )
    # the medians ride the SAME series_id exchange+sort the lag window
    # already paid (unbounded-frame window aggregates, not a separate
    # groupBy + join back — that shape cost an extra shuffle, a broadcast,
    # and a full second pass over the periodogram; measured 1.9× slower at
    # sf0.1)
    enr = diffs.select(
        "*",
        F.median("df_i").over(wall).alias("median_df"),
        (-F.median("dp_i").over(wall)).alias("median_dp"),
    )
    agg = (
        enr
        .groupBy("series_id")
        .agg(
            F.max_by("frequency", "power").alias("fmax"),
            F.max_by(1.0 / F.col("frequency"), F.col("power")).alias("pmax"),
            F.first("median_df").alias("median_df"),
            F.first("median_dp").alias("median_dp"),
            F.min(
                F.when(F.col("df_i").isNull(), True).otherwise(
                    F.abs(F.col("df_i") - F.col("median_df"))
                    <= _ATOL + _RTOL * F.abs(F.col("median_df"))
                )
            ).alias("is_uniform_f"),
        )
    )
    return agg.withColumn(
        "df", F.when(F.col("is_uniform_f"), F.col("median_df"))
    )
