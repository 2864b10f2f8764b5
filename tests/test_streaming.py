"""Structured Streaming surface: memory-sink smoke tests driven to
completion with processAllAvailable (file source over the events parquet)."""

import pytest
from pyspark.sql import functions as F

from periodicity_spark.streaming import (
    events_stream,
    stream_downsample,
    stream_ffill,
    stream_sessionize,
)

SF = "/root/testdata/sf0.001"


def _run(df, name):
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_stream_downsample(spark):
    ev = events_stream(spark, SF)
    _run(stream_downsample(ev, window="1 day"), "sd_out")
    out = spark.sql("SELECT * FROM sd_out")
    assert out.count() > 0
    # one row per (series, day); matches the batch daily downsample row count scale
    assert out.select("series_id").distinct().count() == 75


def test_stream_sessionize(spark):
    ev = events_stream(spark, SF)
    _run(stream_sessionize(ev, gap="6 hours"), "ss_out")
    out = spark.sql("SELECT * FROM ss_out")
    n = out.count()
    assert n > 75  # more sessions than series
    # sessions end after start
    assert out.filter(F.col("t_end") < F.col("t_start")).count() == 0


def test_stream_ffill(spark):
    ev = events_stream(spark, SF).withColumn(
        "value", F.when(F.rand(1) < 0.2, None).otherwise(F.col("value"))
    )
    _run(stream_ffill(ev), "ff_out")
    out = spark.sql("SELECT * FROM ff_out")
    assert out.count() == 1000
    # every null value with a non-null predecessor got filled
    nulls_unfilled = out.filter(F.col("value").isNull() & F.col("filled").isNull()).count()
    total_nulls = out.filter(F.col("value").isNull()).count()
    assert total_nulls > 0
    assert nulls_unfilled < total_nulls


def test_stream_dedup(spark):
    from periodicity_spark.streaming import stream_dedup

    ev = events_stream(spark, SF)
    # duplicate the stream at the source: union with itself → every event
    # arrives twice; dedup must return each exactly once
    doubled = ev.unionByName(ev)
    _run(stream_dedup(doubled, keys=["series_id", "ts", "value"]), "dd_out")
    got = spark.sql("SELECT count(*) AS n FROM dd_out").collect()[0]["n"]
    want = (
        spark.read.parquet(f"{SF}/events.parquet")
        .select(
            F.concat_ws("/", F.col("user_id"), F.col("event_type")),
            "ts",
            "value",
        )
        .distinct()
        .count()
    )
    assert got == want
