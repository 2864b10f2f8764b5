"""Plan-identity pins for the r11 series_stats / pg_stats SQL-string
rewrites (guide §5 — driver-side Column chatter): the former Column-object
formulations are re-implemented verbatim and the OPTIMIZED plans asserted
byte-identical modulo expression ids. Plan equality implies result
equality, to the bit."""

import re

from pyspark.sql import functions as F
from pyspark.sql import Window

from periodicity_spark.functions.stats import _ATOL, _RTOL, pg_stats, series_stats


def _canon(df) -> str:
    s = df._jdf.queryExecution().optimizedPlan().toString()
    return re.sub(r"#\d+", "#N", s)


def _old_series_stats(ts):
    diffs = ts.selectExpr(
        "series_id",
        "time",
        "value",
        "time - lag(time) OVER (PARTITION BY series_id ORDER BY time) AS dt_i",
    )
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


def _old_pg_stats(pg):
    w = Window.partitionBy("series_id").orderBy("frequency")
    wall = Window.partitionBy("series_id")
    diffs = pg.select(
        "series_id",
        "frequency",
        "power",
        (F.col("frequency") - F.lag("frequency").over(w)).alias("df_i"),
        ((1.0 / F.col("frequency")) - (1.0 / F.lag("frequency").over(w))).alias("dp_i"),
    )
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


def test_series_stats_sql_build_plan_identical(spark, sf_dir):
    from periodicity_spark.sources.ingest import ts_from_events

    ts = ts_from_events(spark, sf_dir)
    assert _canon(series_stats(ts)) == _canon(_old_series_stats(ts))


def test_pg_stats_sql_build_plan_identical(spark):
    pg = spark.createDataFrame(
        [("s0", 0.1 * (i + 1), float(i % 5)) for i in range(40)],
        "series_id string, frequency double, power double",
    )
    assert _canon(pg_stats(pg)) == _canon(_old_pg_stats(pg))
