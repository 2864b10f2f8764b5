"""Series-store sink: partition pruning + roundtrip + CSV source."""

import pandas as pd
from pyspark.sql import functions as F

from periodicity_spark.sources.ingest import ts_from_events
from periodicity_spark.sources.sink import (
    read_series_store,
    ts_from_csv,
    write_series_store,
)


def test_series_store_roundtrip_and_partition_pruning(spark, sf_dir, tmp_path):
    ts = ts_from_events(spark, sf_dir)
    path = str(tmp_path / "store")
    write_series_store(ts, path, bucket_days=2.0)

    back = read_series_store(spark, path)
    # lossless roundtrip of the canonical columns
    want = ts.toPandas().sort_values(["series_id", "time"], ignore_index=True)
    got = (
        back.select("series_id", "time", "value")
        .toPandas()
        .sort_values(["series_id", "time"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want)

    # a time-range query must prune at the PARTITION level: the scan's
    # partition count drops and the bucket predicate appears as a
    # PartitionFilter (planning-time, zero I/O for excluded buckets)
    q = back.filter(F.col("day_bucket") == 0)
    q.collect()
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(day_bucket" in plan.replace("#", "") or (
        "day_bucket" in plan.split("PartitionFilters")[1].split("]")[0]
    ), plan.split("PartitionFilters")[-1][:200]
    n_all = ts.count()
    n_pruned = q.count()
    assert 0 < n_pruned < n_all


def test_series_store_files_are_sorted_within_partitions(spark, sf_dir, tmp_path):
    """The within-file (series_id, time) sort is what gives parquet row-group
    min/max stats their selectivity — verify the physical order landed."""
    ts = ts_from_events(spark, sf_dir)
    path = str(tmp_path / "store2")
    write_series_store(ts, path, bucket_days=5.0)
    import glob

    files = glob.glob(f"{path}/day_bucket=*/*.parquet")
    assert files
    pdf = pd.read_parquet(files[0])
    assert list(pdf.itertuples(index=False)) == sorted(
        pdf.itertuples(index=False), key=lambda r: (r.series_id, r.time)
    )


def test_ts_from_csv_roundtrip_with_sentinel(spark, tmp_path):
    src = pd.DataFrame(
        {
            "series_id": ["a", "a", "b"],
            "time": [0.0, 1.0, 0.5],
            "value": [1.5, -99.0, 2.5],
        }
    )
    p = str(tmp_path / "ts_csv")
    spark.createDataFrame(src).coalesce(1).write.option("header", "true").csv(p)
    out = (
        ts_from_csv(spark, p, sentinel=-99.0)
        .toPandas()
        .sort_values(["series_id", "time"], ignore_index=True)
    )
    assert out["value"].tolist()[0] == 1.5
    assert pd.isna(out["value"].tolist()[1])  # sentinel → NULL
    assert out["value"].tolist()[2] == 2.5
    assert out.dtypes["time"] == "float64"


def test_stream_to_series_store_matches_batch_layout(spark, sf_dir, tmp_path):
    """Stream-written store == batch-written store: same day_bucket
    partition directories, same rows; a reader cannot tell how a file
    arrived, and partition pruning works identically."""
    import os

    from periodicity_spark.sources.ingest import ts_from_events
    from periodicity_spark.sources.sink import (
        read_series_store,
        stream_to_series_store,
        write_series_store,
    )

    ts = ts_from_events(spark, sf_dir).filter(F.col("value").isNotNull())
    batch_path = str(tmp_path / "batch_store")
    write_series_store(ts, batch_path, bucket_days=2.0)

    # file-stream the same rows (as parquet) into the streaming writer
    src = str(tmp_path / "src")
    ts.write.parquet(src)
    ev = spark.readStream.schema(ts.schema).parquet(src)
    q = stream_to_series_store(
        ev,
        str(tmp_path / "stream_store"),
        str(tmp_path / "ckpt"),
        bucket_days=2.0,
    )
    q.awaitTermination()

    b_parts = {d for d in os.listdir(batch_path) if d.startswith("day_bucket=")}
    s_parts = {
        d for d in os.listdir(str(tmp_path / "stream_store")) if d.startswith("day_bucket=")
    }
    assert s_parts == b_parts and len(b_parts) > 1

    a = (
        read_series_store(spark, batch_path)
        .toPandas()
        .sort_values(["series_id", "time"])
        .reset_index(drop=True)
    )
    b = (
        read_series_store(spark, str(tmp_path / "stream_store"))
        .toPandas()
        .sort_values(["series_id", "time"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_jsonl_roundtrip_and_corrupt_line_tolerance(spark, tmp_path):
    """JSONL source: explicit schema (no inference pass), malformed lines
    dropped not fatal, extra keys ignored; write→read roundtrips."""
    from periodicity_spark.sources.sink import docs_from_jsonl, write_jsonl

    src = tmp_path / "docs.jsonl"
    src.write_text(
        '{"doc_id": 1, "text": "hello world", "extra": 7}\n'
        "this line is not json\n"
        '{"doc_id": 2, "text": "second doc"}\n'
        '{"text": "no id -> dropped"}\n'
    )
    docs = docs_from_jsonl(spark, str(src))
    out = docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 2]
    assert out["text"].tolist() == ["hello world", "second doc"]
    assert docs.columns == ["doc_id", "text"]

    dst = str(tmp_path / "out_jsonl")
    write_jsonl(docs, dst)
    back = docs_from_jsonl(spark, dst).toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, back)
