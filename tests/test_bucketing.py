"""Bucketed-table co-location: the storage-side half of the 100 TB story.

Every repeated groupBy/join on series_id pays one shuffle per query. For a
table that is the input of MANY such queries (the hypertable shape), the
cluster-scale answer is to pay the shuffle ONCE at write time — a bucketed
parquet table clustered by the key — after which aggregates and equi-joins
on that key run with ZERO exchanges: each task reads its bucket and
reduces/joins locally. These tests assert Spark actually exploits our
bucketed layout (a bucketed write that the planner ignores would be silent
waste at scale).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    from periodicity_spark.sources.ingest import ts_from_events

    base = tmp_path_factory.mktemp("buckets")
    ts = ts_from_events(spark, sf_dir)
    names = []
    for name in ("ts_bucketed_a", "ts_bucketed_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            ts.write.format("parquet")
            .bucketBy(8, "series_id")
            .option("path", str(base / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
        names.append(name)
    yield names
    for name in names:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def _executed_plan(df):
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_groupby_runs_with_zero_exchanges(spark, bucketed_tables):
    t = spark.table(bucketed_tables[0])
    agg = t.groupBy("series_id").agg(
        F.count(F.lit(1)).alias("n"), F.avg("value").alias("mean")
    )
    plan = _executed_plan(agg)
    assert "Exchange" not in plan, "bucketed groupBy still shuffled"
    assert "Bucketed: true" in plan


def test_bucketed_equi_join_runs_with_zero_exchanges(spark, bucketed_tables):
    """The big-big shape: with broadcast disabled (at 100 TB neither side
    fits), the join of two tables bucketed on the key must be a SortMergeJoin
    with ZERO Exchange nodes — each task zips its two co-located buckets."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table(bucketed_tables[0]).groupBy("series_id").agg(
            F.avg("value").alias("ma")
        )
        b = spark.table(bucketed_tables[1]).groupBy("series_id").agg(
            F.max("value").alias("mb")
        )
        joined = a.join(b, "series_id")
        plan = _executed_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        if prev_aqe:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe)
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    assert "Exchange" not in plan, "bucket-co-located join still shuffled"
    assert "SortMergeJoin" in plan


def test_bucketed_results_match_unbucketed(spark, sf_dir, bucketed_tables):
    from periodicity_spark.sources.ingest import ts_from_events

    want = (
        ts_from_events(spark, sf_dir)
        .groupBy("series_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
        .sort_values("series_id", ignore_index=True)
    )
    got = (
        spark.table(bucketed_tables[0])
        .groupBy("series_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
        .sort_values("series_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want)
