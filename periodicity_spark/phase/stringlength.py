"""Dworetsky String Length, Spark-first (reference phase.py:18-72).

The reference parallelizes over trial periods with multiprocessing.Pool
(phase.py:69-70), pickling the full arrays into each worker. Here the period
grid is crossed with the samples in one shuffle — Spark's partitioning over
(series, period) replaces the Pool, and scales over both axes.

ℓ(P) = Σᵢ hypot(m₍ᵢ₊₁₎ − mᵢ, φ₍ᵢ₊₁₎ − φᵢ)  over phase-sorted samples with a
wraparound pair (np.roll, phase.py:50), where m is the signal min-max scaled
to [−0.25, 0.25] (phase.py:66) and φ = (t/P) mod 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from periodicity_spark.functions.expressions import fold_expr
from periodicity_spark.functions.stats import series_stats


def _scale(ts: DataFrame) -> DataFrame:
    """m = (x − max)/(2(max−min)) + 0.25 (reference phase.py:66)."""
    mm = ts.groupBy("series_id").agg(
        F.min("value").alias("_vmin"), F.max("value").alias("_vmax")
    )
    return (
        ts.join(F.broadcast(mm), "series_id")
        .filter(F.col("_vmax") > F.col("_vmin"))
        .select(
            "series_id",
            "time",
            (
                (F.col("value") - F.col("_vmax"))
                / (2 * (F.col("_vmax") - F.col("_vmin")))
                + 0.25
            ).alias("m"),
        )
    )


def string_length(ts: DataFrame, periods: DataFrame) -> DataFrame:
    """→ (series_id, period, ell). periods: (period) or (series_id, period)."""
    from periodicity_spark.session import scan_parallel

    # the N×P fold expansion and its shuffle write run inside the scan
    # tasks; floor the parallelism so a single-row-group input does not
    # serialize them onto one core (no-op on well-partitioned scans)
    # probe the caller's frame, then filter — the filter pushes through the
    # repartition (executed plan unchanged), and a repeat caller's Dataset
    # probes from its cached RDD instead of a cold re-plan
    scaled = _scale(scan_parallel(ts).filter(F.col("value").isNotNull()))
    if "series_id" in periods.columns:
        crossed = scaled.join(periods, "series_id")
    else:
        crossed = scaled.crossJoin(F.broadcast(periods))
    folded = crossed.select(
        "series_id",
        "period",
        fold_expr("time", F.col("period")).alias("phi"),
        "m",
    )
    w = Window.partitionBy("series_id", "period").orderBy("phi", "m")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    nxt_m = F.coalesce(F.lead("m").over(w), F.first("m").over(wfull))
    nxt_p = F.coalesce(F.lead("phi").over(w), F.first("phi").over(wfull))
    seg = F.hypot(nxt_m - F.col("m"), nxt_p - F.col("phi"))
    return (
        folded.withColumn("_seg", seg)
        .groupBy("series_id", "period")
        .agg(F.sum("_seg").alias("ell"))
    )


class StringLength:
    """Reference-default grid: periods = 1/linspace(n·df, df, n), df = dphi/baseline
    (phase.py:67-68). Returns pg-style output keyed by period."""

    def __init__(self, dphi: float = 0.1, n_periods: int = 1000):
        self.dphi = dphi
        self.n_periods = n_periods

    def __call__(self, ts: DataFrame) -> DataFrame:
        n = self.n_periods
        grid = (
            series_stats(ts)
            .select("series_id", (F.lit(self.dphi) / F.col("baseline")).alias("_df"))
            .select(
                "series_id",
                F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("_k"),
                "_df",
            )
            # linspace(n·df, df, n)[k] = n·df + k·(df − n·df)/(n−1)
            .select(
                "series_id",
                (
                    1.0
                    / (
                        F.lit(float(n)) * F.col("_df")
                        + F.col("_k")
                        * (F.col("_df") - F.lit(float(n)) * F.col("_df"))
                        / F.lit(float(n - 1))
                    )
                ).alias("period"),
            )
        )
        return string_length(ts, grid)
