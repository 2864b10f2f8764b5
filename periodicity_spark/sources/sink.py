"""Series-store sinks: the write side of the engine.

The reference renders results to matplotlib / numpy arrays (core.py plot
methods); a Spark engine's sink is a TABLE LAYOUT. The layout chosen here
is the one that makes the common access patterns cheap at 100 TB:

- ``write_series_store``: parquet partitioned by a coarse time bucket
  (``day_bucket = floor(time / bucket_days)``) and sorted by
  (series_id, time) WITHIN each file. Time-range queries prune whole
  partitions at planning time (PartitionFilters, zero I/O for excluded
  buckets); per-series scans ride the parquet min/max row-group stats the
  within-file sort produces. Writing shuffles once; every later range
  query skips the data it doesn't need.
- ``read_series_store``: reads the layout back to the engine's canonical
  (series_id, time, value) shape.

For the key-equality workload (many per-series joins/aggregates) use a
bucketed table instead — tests/test_bucketing.py certifies that layout.

CSV ingestion (``ts_from_csv``) mirrors ts_from_parquet for the
interchange-format case; explicit schema, no inference scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_series_store(
    ts: DataFrame, path: str, bucket_days: float = 30.0, mode: str = "overwrite"
) -> None:
    """Write (series_id, time, value[, ...]) as a partition-pruned,
    row-group-ordered parquet store."""
    out = ts.withColumn(
        "day_bucket", F.floor(F.col("time") / F.lit(float(bucket_days))).cast("long")
    )
    # day_bucket leads the sort: the partitioned writer re-sorts any task
    # whose rows are not clustered by the partition column (destroying a
    # secondary order); leading with it makes the task order AlreadySorted
    # for the writer, so the (series_id, time) order survives into the files
    (
        out.repartition("day_bucket")
        .sortWithinPartitions("day_bucket", "series_id", "time")
        .write.partitionBy("day_bucket")
        .mode(mode)
        .parquet(path)
    )


def read_series_store(spark: SparkSession, path: str) -> DataFrame:
    """Read the partitioned store back to the canonical column order; the
    partition column stays available for manual pruning predicates."""
    df = spark.read.parquet(path)
    rest = [c for c in df.columns if c not in ("series_id", "time", "value")]
    return df.select("series_id", "time", "value", *rest)


def ts_from_csv(
    spark: SparkSession,
    path: str,
    series_col: str = "series_id",
    time_col: str = "time",
    value_col: str = "value",
    sentinel: float | None = None,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV twin of ts_from_parquet: explicit schema (no inference pass over
    the files), sentinel→NULL and NaN→NULL normalization at the boundary."""
    schema = f"`{series_col}` string, `{time_col}` double, `{value_col}` double"
    df = (
        spark.read.option("header", str(header).lower())
        .option("sep", sep)
        .schema(schema)
        .csv(path)
    )
    value = F.col(value_col).cast("double")
    if sentinel is not None:
        value = F.when(value == F.lit(float(sentinel)), F.lit(None)).otherwise(value)
    value = F.when(F.isnan(value), F.lit(None)).otherwise(value)
    return df.select(
        F.col(series_col).cast("string").alias("series_id"),
        F.col(time_col).cast("double").alias("time"),
        value.alias("value"),
    )


def stream_to_series_store(
    events: DataFrame,
    path: str,
    checkpoint: str,
    bucket_days: float = 30.0,
    trigger_available_now: bool = True,
):
    """Streaming writer into the SAME partitioned series-store layout the
    batch writer produces (day_bucket partition directories, exactly-once
    via the checkpointed file-sink commit log). Late data lands in its
    correct day_bucket partition — partition pruning on read works
    identically for stream- and batch-written data, so a reader never
    distinguishes how a file arrived.

    events: streaming (series_id, time double, value[, ...]).
    Returns the StreamingQuery (caller awaits / stops)."""
    out = events.withColumn(
        "day_bucket", F.floor(F.col("time") / F.lit(float(bucket_days))).cast("long")
    )
    w = (
        out.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("day_bucket")
        .outputMode("append")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def docs_from_jsonl(
    spark: SparkSession,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """JSONL document source — the standard LLM-corpus interchange format
    (one JSON object per line). Explicit schema: no inference pass over the
    corpus (schema inference reads EVERY file once before the real scan —
    at 100 TB that doubles ingest IO), malformed lines land in
    ``_corrupt_record`` instead of failing the job (PERMISSIVE mode) and
    are dropped here after a count-free filter. Extra keys are ignored by
    schema projection — pushdown prunes them at the JSON parser."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField(text_col, StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return (
        df.filter(F.col("_corrupt_record").isNull() & F.col(id_col).isNotNull())
        .select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    )


def write_jsonl(docs: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSONL document sink (one object per line, spark text-partitioned)."""
    docs.write.mode(mode).json(path)
