"""Ingestion: parquet tables → long-format ts DataFrames.

Mirrors the reference's construction semantics (core.py:461-477): values
validated, sentinel/NaN normalized to NULL at the boundary so that every
downstream aggregate is null-skipping (the reference uses np.nan* reducers,
core.py:202-260 — Spark aggregates skip NULL, so NaN→NULL at ingestion gives
identical semantics).

Timestamps are converted to double seconds at the boundary (the reference
uses plain float time axes, data/__init__.py:20-22).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# 2024-01-01T00:00:00Z in epoch microseconds — the time origin for
# events-derived series. Rebasing before the int→double conversion keeps the
# value < 2^53, so the time axis is EXACT at microsecond resolution.
EVENTS_EPOCH_US = 1704067200000000
US_PER_DAY = 86400000000.0


def ts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events(event_id, ts, user_id, event_type, value, props) → ts rows.

    series_id = '<user_id>/<event_type>'; time = DAYS since 2024-01-01 UTC.

    The testdata's ``ts`` is parquet TIMESTAMP(NANOS), which Spark 4 rejects
    unless ``spark.sql.legacy.parquet.nanosAsLong`` is set (runtime conf).
    DuckDB truncates the same column to microseconds, so we truncate too
    (integer ``div 1000``) — both engines then see the identical double:
    time = (epoch_us − EVENTS_EPOCH_US) / 86400e6.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = load_table(spark, sf_dir, "events")
    time = (
        (F.expr("ts div 1000") - F.lit(EVENTS_EPOCH_US)).cast("double")
        / F.lit(US_PER_DAY)
    )
    return ev.select(
        F.concat_ws("/", F.col("user_id"), F.col("event_type")).alias("series_id"),
        time.alias("time"),
        F.col("value").alias("value"),
    )


def events_with_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full events table + the aligned double ``time`` column (days)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = load_table(spark, sf_dir, "events")
    time = (
        (F.expr("ts div 1000") - F.lit(EVENTS_EPOCH_US)).cast("double")
        / F.lit(US_PER_DAY)
    )
    return ev.withColumn("time", time)


def ts_from_parquet(
    spark: SparkSession,
    path: str,
    series_col: str = "series_id",
    time_col: str = "time",
    value_col: str = "value",
    sentinel: float | None = None,
) -> DataFrame:
    """Generic ts loader with sentinel→NULL normalization.

    The reference's bundled datasets use sentinels (−1 sunspots, −99 TSI;
    data/__init__.py:31-33,52-53) — those become NULL here.
    """
    df = spark.read.parquet(path)
    value = F.col(value_col).cast("double")
    if sentinel is not None:
        value = F.when(value == F.lit(float(sentinel)), F.lit(None)).otherwise(value)
    value = F.when(F.isnan(value), F.lit(None)).otherwise(value)
    time = F.col(time_col)
    if dict(df.dtypes)[time_col].startswith("timestamp"):
        time = time.cast("double")
    else:
        time = time.cast("double")
    return df.select(
        F.col(series_col).cast("string").alias("series_id"),
        time.alias("time"),
        value.alias("value"),
    )


FIXTURES_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
_FIXTURES = {
    # name → (sentinel, has err column)  (reference data/__init__.py:6-64)
    "spotted_star": (None, True),
    "sunspots": (-1.0, False),
    "tsi": (-99.0, False),
}


def load_fixture(spark: SparkSession, name: str) -> DataFrame:
    """Bundled public observational datasets as (series_id, time, value[, err])
    with sentinel→NULL normalization — parquet conversions of the same public
    data the reference bundles (KIC 9655172 light curve, WDC-SILSO sunspot
    number, PMOD TSI composite; data/__init__.py:6-64). Regenerate with
    tools/make_fixtures.py."""
    if name not in _FIXTURES:
        raise ValueError(f"unknown fixture: {name!r} (have {sorted(_FIXTURES)})")
    sentinel, has_err = _FIXTURES[name]
    path = os.path.join(FIXTURES_DIR, f"{name}.parquet")
    df = spark.read.parquet(path)
    value = F.col("value").cast("double")
    if sentinel is not None:
        value = F.when(value == F.lit(sentinel), F.lit(None)).otherwise(value)
    cols = [
        F.col("series_id").cast("string").alias("series_id"),
        F.col("time").cast("double").alias("time"),
        value.alias("value"),
    ]
    if has_err:
        cols.append(F.col("err").cast("double").alias("err"))
    return df.select(*cols)


def spotted_star(spark: SparkSession) -> DataFrame:
    """KIC 9655172 Kepler light curve (t, y, dy), 2148 samples."""
    return load_fixture(spark, "spotted_star")


def sunspots(spark: SparkSession) -> DataFrame:
    """WDC-SILSO daily total sunspot number, 1818-2021; −1 sentinel → NULL."""
    return load_fixture(spark, "sunspots")


def tsi(spark: SparkSession) -> DataFrame:
    """PMOD composite Total Solar Irradiance, 1978-2012; −99 sentinel → NULL."""
    return load_fixture(spark, "tsi")
