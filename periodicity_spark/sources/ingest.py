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


def epoch_us_expr(df: DataFrame, col: str = "ts"):
    """Epoch-microseconds BIGINT from whatever physical type the events
    timestamp arrives as. The engine must ingest the data the environment
    serves — micro- OR nano-resolution parquet timestamps:

    - ``timestamp_ntz`` (parquet TIMESTAMP(MICROS/NANOS, isAdjustedToUTC=
      false), Spark 4 default read): wall-clock diff against the NTZ epoch
      literal. Deliberately timezone-INDEPENDENT — no NTZ→TZ cast, so the
      result cannot shift under a session timezone other than UTC, and it
      matches DuckDB's ``epoch_us(ts)`` on the same naive column exactly.
    - ``timestamp`` (instant-typed column): ``unix_micros`` — already an
      absolute instant, also tz-independent.
    - ``bigint`` (legacy ``spark.sql.legacy.parquet.nanosAsLong`` read of a
      TIMESTAMP(NANOS) column): integer-truncate nanos→micros, matching
      DuckDB's micro truncation of the same column.
    """
    dtype = dict(df.dtypes)[col]
    if dtype == "bigint":
        return F.expr(f"{col} div 1000")
    if dtype == "timestamp_ntz":
        return F.expr(
            f"timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', {col})"
        )
    if dtype == "timestamp":
        return F.unix_micros(F.col(col))
    raise TypeError(
        f"events.{col} has unsupported type {dtype!r}; "
        "expected timestamp, timestamp_ntz, or bigint (nanos-as-long)"
    )


def _events_day_axis(ev: DataFrame):
    """Double days since 2024-01-01: (epoch_us − EVENTS_EPOCH_US) / 86400e6."""
    return (epoch_us_expr(ev) - F.lit(EVENTS_EPOCH_US)).cast("double") / F.lit(
        US_PER_DAY
    )


def ts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events(event_id, ts, user_id, event_type, value, props) → ts rows.

    series_id = '<user_id>/<event_type>'; time = DAYS since 2024-01-01 UTC.
    ``ts`` may be parquet TIMESTAMP(MICROS), TIMESTAMP(NANOS), or a raw
    nanos long — see epoch_us_expr. The reference uses plain float time
    axes (data/__init__.py:20-22); this is the Spark ingestion boundary
    that produces them.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = load_table(spark, sf_dir, "events")
    # value is cast at the boundary: the engine contract is value: double,
    # regardless of the physical column width the environment serves (a
    # float32 drift would otherwise reach the Arrow kernels as float32
    # pandas and change reduction dtypes)
    return ev.select(
        F.concat_ws("/", F.col("user_id"), F.col("event_type")).alias("series_id"),
        _events_day_axis(ev).alias("time"),
        F.col("value").cast("double").alias("value"),
    )


def events_with_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full events table + the aligned double ``time`` column (days)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn("time", _events_day_axis(ev))


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
    if dict(df.dtypes)[time_col].startswith("timestamp"):
        # timestamp-typed axis → double SECONDS since epoch, via the same
        # tz-independent micros conversion the events path uses (a plain
        # .cast("double") is illegal on TIMESTAMP_NTZ and tz-dependent
        # through the NTZ→TZ route)
        time = epoch_us_expr(df, time_col).cast("double") / F.lit(1e6)
    else:
        time = F.col(time_col).cast("double")
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
