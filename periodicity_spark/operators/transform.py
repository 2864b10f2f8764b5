"""Projection / element-wise transforms on ts DataFrames (SURVEY.md §2.2).

All pure column expressions — Catalyst fuses chains of these into a single
projection over the scan (the reference allocates a new array per step,
core.py:158-187; here the whole chain is one codegen stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from periodicity_spark.functions.expressions import fold_expr


def timeshift(ts: DataFrame, t0: float) -> DataFrame:
    """reference core.py:537-538"""
    return ts.withColumn("time", F.col("time") + F.lit(float(t0)))


def timescale(ts: DataFrame, alpha: float) -> DataFrame:
    """reference core.py:540-541"""
    return ts.withColumn("time", F.col("time") * F.lit(float(alpha)))


def fold(ts: DataFrame, period: float, t0: float = 0.0) -> DataFrame:
    """Phase fold: time ← ((time−t0)/period) mod 1 (reference core.py:543-544).
    Re-sorting is logical — downstream ops order by the new time."""
    return ts.withColumn("time", fold_expr("time", float(period), float(t0)))


def dropna(ts: DataFrame, col: str = "value") -> DataFrame:
    """reference core.py:557-558"""
    return ts.filter(F.col(col).isNotNull() & ~F.isnan(col))


def roll(ts: DataFrame, shift: int) -> DataFrame:
    """Circular shift of values along the time order (reference core.py:262-264,
    np.roll semantics: values move forward by ``shift``; time stays)."""
    w = Window.partitionBy("series_id").orderBy("time")
    rn = F.row_number().over(w) - 1
    cnt = F.count(F.lit(1)).over(Window.partitionBy("series_id"))
    # destination slots, with the source position they need
    slots = ts.select(
        "series_id",
        "time",
        ((((rn - F.lit(shift)) % cnt) + cnt) % cnt).alias("_src"),
    )
    vals = ts.select(
        F.col("series_id").alias("_sid"), F.col("value").alias("_v"), rn.alias("_pos")
    )
    return (
        slots.join(
            vals,
            (slots["series_id"] == vals["_sid"]) & (slots["_src"] == vals["_pos"]),
        )
        .select("series_id", "time", F.col("_v").alias("value"))
    )


def slice_by_position(ts: DataFrame, start: int, stop: int) -> DataFrame:
    """Positional slice via row_number (reference __getitem__, core.py:489-494)."""
    w = Window.partitionBy("series_id").orderBy("time")
    return (
        ts.withColumn("_rn", F.row_number().over(w) - 1)
        .filter((F.col("_rn") >= start) & (F.col("_rn") < stop))
        .drop("_rn")
    )


def drop_by_position(ts: DataFrame, positions: list[int]) -> DataFrame:
    """Delete rows by (0-based) position per series (reference core.py:717-724)."""
    w = Window.partitionBy("series_id").orderBy("time")
    n = Window.partitionBy("series_id")
    cnt = F.count(F.lit(1)).over(n)
    rn = F.row_number().over(w) - 1
    df = ts.withColumn("_rn", rn).withColumn("_n", cnt)
    cond = F.lit(False)
    for p in positions:
        norm = F.when(F.lit(p) < 0, F.col("_n") + F.lit(p)).otherwise(F.lit(p))
        cond = cond | (F.col("_rn") == norm)
    return df.filter(~cond).drop("_rn", "_n")


def union_series(a: DataFrame, b: DataFrame) -> DataFrame:
    """Concatenate along time (reference join(), core.py:610-617) — keeps
    duplicate timestamps, like the reference (which only warns on overlap)."""
    return a.unionByName(b)


def overlap_count(a: DataFrame, b: DataFrame) -> int:
    """The reference's overlap warning condition (core.py:611)."""
    return a.join(b, ["series_id", "time"], "left_semi").count()


def fold_profile(
    ts: DataFrame, period: float, nbins: int = 16, t0: float = 0.0
) -> DataFrame:
    """Phase-binned fold profile — the classic phase diagram behind every
    folded-light-curve plot (fold, reference core.py:543-544, followed by
    the binned mean the reference reaches via downsample over folded time):
    → (series_id, bin, phase_center, mean_value, n), one row per non-empty
    phase bin. One shuffle (the (series, bin) hash aggregate with map-side
    combine); NULL values are skipped like every reference reducer."""
    phase = fold_expr("time", float(period), float(t0))
    b = F.least(
        F.floor(phase * F.lit(int(nbins))).cast("int"), F.lit(int(nbins) - 1)
    )
    return (
        ts.filter(F.col("value").isNotNull())
        .select("series_id", b.alias("bin"), "value")
        .groupBy("series_id", "bin")
        .agg(F.avg("value").alias("mean_value"), F.count(F.lit(1)).alias("n"))
        .select(
            "series_id",
            "bin",
            ((F.col("bin") + 0.5) / F.lit(float(nbins))).alias("phase_center"),
            "mean_value",
            "n",
        )
    )
