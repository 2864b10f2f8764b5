"""Distributed cardinality sketching: K-Minimum-Values distinct estimation.

Spark ships HyperLogLog++ (approx_count_distinct), but its sketch is not
reproducible against another engine. KMV (Bar-Yossef et al. 2002) is: hash
every value to a uniform point in (0,1), keep the k smallest per group, and
estimate |distinct| ≈ (k−1) / h_(k). With a deterministic hash (md5, the
repo-wide 60-bit idiom shared with pipeline/dedup.py and pipeline/sample.py)
the estimate is a pure function of the data — bit-identical in DuckDB, so
unlike HLL it is exactly SQL-oracle-able, and the min-k set is mergeable
(union → re-take k smallest), which is what makes it a sketch at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

# 60-bit hash (15 md5 hex chars) normalized into (0, 1]
HASH_SPACE = float(1 << 60)


def _unit_hash(col: Column) -> Column:
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")
    return (h.cast("double") + F.lit(1.0)) / F.lit(HASH_SPACE)


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    merge_buckets: int = 256,
) -> DataFrame:
    """Per-group distinct-count estimate from the k smallest value hashes.
    → (group, n_kept, kth_hash, est_distinct).

    When a group holds fewer than k distinct values the estimate IS the
    exact distinct count (the sketch degenerates to the full hash set);
    otherwise est = (k−1)/h_(k) — the classic KMV estimator, unbiased with
    relative error ~1/√(k−2).

    Scale shape — two-level min-k so no single task sorts a whole group:
      1. distinct (group, hash) pairs pre-aggregate to their k smallest
         WITHIN each of ``merge_buckets`` hash-buckets (bounded sort work,
         parallel across buckets);
      2. the surviving ≤ buckets·k rows per group — a few thousand however
         large the group — merge under one tiny rank window.
    Both levels are plain aggregates/windows: mergeability is the algebra
    of min-k, exactly how a 1000-executor rollup would combine partials.
    """
    hashed = df.select(
        F.col(group_col).alias("group"), _unit_hash(F.col(value_col)).alias("h")
    ).dropDuplicates(["group", "h"])
    bucketed = hashed.withColumn(
        "_bkt", (F.col("h") * merge_buckets).cast("int")
    )
    partial = bucketed.groupBy("group", "_bkt").agg(
        F.slice(F.sort_array(F.collect_list("h")), 1, k).alias("_mins")
    )
    merged = partial.select("group", F.explode("_mins").alias("h"))
    w = Window.partitionBy("group").orderBy("h")
    ranked = merged.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") <= k)
    return ranked.groupBy("group").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("kth_hash"),
        F.when(
            F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
        )
        .otherwise((F.lit(float(k - 1))) / F.max("h"))
        .alias("est_distinct"),
    )
