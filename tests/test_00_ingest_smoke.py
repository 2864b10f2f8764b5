"""Testdata-boundary smoke tests — named to sort FIRST in the suite.

Round 4 post-mortem: the driver's events.ts physical type moved from parquet
timestamp[ns] to timestamp[us] and the whole suite failed with 75 opaque
errors instead of one pointed one. These tests assert "the engine can load
/root/testdata as it exists today" separately from the full contract suite,
so a future physical-schema drift fails HERE with the offending dtype in the
message.
"""

import glob
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from periodicity_spark.sources.ingest import (
    EVENTS_EPOCH_US,
    US_PER_DAY,
    epoch_us_expr,
    load_table,
    ts_from_events,
)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

ALLOWED_TS_TYPES = {"timestamp", "timestamp_ntz", "bigint"}


def _sf_dirs():
    dirs = sorted(glob.glob("/root/testdata/sf*"))
    return dirs or [os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")]


@pytest.mark.parametrize("sf", _sf_dirs())
def test_all_tables_load_and_events_ts_type_supported(spark, sf):
    for name in TABLES:
        path = f"{sf}/{name}.parquet"
        if not os.path.exists(path):
            pytest.fail(f"testdata table missing: {path}")
        df = load_table(spark, sf, name)
        assert len(df.columns) > 0, f"{path}: empty schema"
    ts_type = dict(load_table(spark, sf, "events").dtypes)["ts"]
    assert ts_type in ALLOWED_TS_TYPES, (
        f"{sf}/events.parquet: ts reads as {ts_type!r} — the ingest boundary "
        f"(sources/ingest.py:epoch_us_expr) only handles {sorted(ALLOWED_TS_TYPES)}. "
        "The environment's physical schema drifted again; extend epoch_us_expr."
    )


def test_events_day_axis_matches_duckdb_exactly(spark, sf_dir):
    """The engine's epoch-us math must agree with the DuckDB oracle row-for-row."""
    ev = load_table(spark, sf_dir, "events")
    got = [
        r.us
        for r in ev.orderBy("event_id")
        .select(epoch_us_expr(ev).alias("us"))
        .limit(5)
        .collect()
    ]
    want = [
        r[0]
        for r in duckdb.sql(
            f"select epoch_us(ts) from read_parquet('{sf_dir}/events.parquet') "
            "order by event_id limit 5"
        ).fetchall()
    ]
    assert got == want, (
        f"engine epoch_us {got} != duckdb {want} — time-axis drift at {sf_dir}"
    )
    # and a known absolute day value: first event lands on day 0 (2024-01-01)
    t0 = (want[0] - EVENTS_EPOCH_US) / US_PER_DAY
    ts = ts_from_events(spark, sf_dir)
    row = ts.orderBy("time").limit(1).collect()[0]
    assert abs(row.time - t0) < 1e-12 or row.time <= t0


def test_events_time_is_session_timezone_independent(spark, sf_dir):
    """ADVICE r4: an NTZ→TZ cast would silently shift the day axis under a
    non-UTC session timezone. The conversion must not depend on the pin in
    session.py."""
    ev = load_table(spark, sf_dir, "events")
    q = ev.orderBy("event_id").select(epoch_us_expr(ev).alias("us")).limit(5)
    utc = [r.us for r in q.collect()]
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        shifted = [r.us for r in q.collect()]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert utc == shifted, "events time axis shifts with session timezone"


def test_ts_from_parquet_accepts_timestamp_axis(spark, tmp_path):
    """The generic loader converts a timestamp-typed time column to double
    SECONDS tz-independently (same epoch_us_expr path as events)."""
    from periodicity_spark.sources.ingest import ts_from_parquet

    src = spark.sql(
        "select 's' as series_id, "
        "timestamp_ntz'2024-01-01 00:00:10' as time, 1.0 as value"
    )
    p = str(tmp_path / "ts.parquet")
    src.write.parquet(p)
    row = ts_from_parquet(spark, p).collect()[0]
    assert row.time == 1704067210.0
    assert row.value == 1.0


def test_pipeline_table_invariants_hold(spark, sf_dir):
    """The columns + engine-facing dtypes the pipeline operators rely on.
    A drift here (text→binary, embedding→array<double>, doc_id→string)
    should fail THIS test with the offending dtype, not 30 contract rows."""
    docs = dict(load_table(spark, sf_dir, "documents").dtypes)
    assert docs.get("doc_id") in {"bigint", "int"}, docs
    assert docs.get("text") == "string", docs
    emb = dict(load_table(spark, sf_dir, "embeddings").dtypes)
    assert emb.get("vec_id") in {"bigint", "int"}, emb
    assert emb.get("embedding") in {"array<float>", "array<double>"}, emb
    li = dict(load_table(spark, sf_dir, "lineitem").dtypes)
    assert li.get("l_shipdate") in {"timestamp", "timestamp_ntz", "date"}, li
    for c in ("l_quantity", "l_extendedprice", "l_discount"):
        assert li.get(c) in {"double", "float", "decimal(12,2)"}, (c, li)


def test_ts_from_events_yields_rows_with_finite_time(spark, sf_dir):
    ts = ts_from_events(spark, sf_dir)
    assert ts.columns == ["series_id", "time", "value"]
    assert dict(ts.dtypes) == {
        "series_id": "string", "time": "double", "value": "double",
    }, f"ingestion boundary contract broken: {dict(ts.dtypes)}"
    agg = ts.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("time").alias("tmin"),
        F.max("time").alias("tmax"),
    ).collect()[0]
    assert agg.n > 0, "ts_from_events read ZERO rows — silent reader failure"
    assert agg.tmin is not None and agg.tmax is not None
    assert -1.0 <= agg.tmin <= agg.tmax < 100000.0


def test_epoch_us_expr_identical_across_all_physical_types(spark, tmp_path):
    """Drift inoculation for the r4 failure class: the SAME instants stored
    as parquet timestamp[us] (NTZ), instant timestamp, and raw nanos-long
    must produce byte-identical epoch-micros through epoch_us_expr — so the
    NEXT physical-type flip cannot change any derived time axis."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from periodicity_spark.sources.ingest import epoch_us_expr

    us = [1704067200000000, 1704070800000000, 1721088000123456]

    p_ntz = str(tmp_path / "ntz.parquet")
    pq.write_table(
        pa.table({"ts": pa.array(us, pa.timestamp("us"))}), p_ntz
    )
    p_tz = str(tmp_path / "tz.parquet")
    pq.write_table(
        pa.table({"ts": pa.array(us, pa.timestamp("us", tz="UTC"))}), p_tz
    )
    p_ns = str(tmp_path / "ns.parquet")
    pq.write_table(pa.table({"ts": pa.array([u * 1000 for u in us], pa.int64())}), p_ns)

    got = {}
    for name, path in [("ntz", p_ntz), ("tz", p_tz), ("ns", p_ns)]:
        df = spark.read.parquet(path)
        got[name] = sorted(
            r[0] for r in df.select(epoch_us_expr(df).alias("us")).collect()
        )
    assert got["ntz"] == got["tz"] == got["ns"] == sorted(us), got
