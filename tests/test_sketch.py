"""KMV distinct sketch (pipeline/sketch.py) + top_keywords (pipeline/text.py)."""

import pytest
from pyspark.sql import functions as F

from periodicity_spark.pipeline import sketch as K
from periodicity_spark.pipeline import text as T


def _toks(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("source", F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
    )


def test_kmv_exact_below_k(spark):
    # 10 distinct values with k=64 → the sketch IS the exact count
    df = spark.createDataFrame(
        [("g", f"v{i % 10}") for i in range(100)], ["source", "token"]
    )
    row = K.kmv_distinct(df, "source", "token", k=64).collect()[0]
    assert row["n_kept"] == 10
    assert row["est_distinct"] == 10.0


def test_kmv_estimates_within_sampling_error(spark):
    # 2000 distinct values, k=64 → relative error ~1/sqrt(62) ≈ 13%;
    # assert a generous 3-sigma band (deterministic: passes or fails always)
    df = spark.createDataFrame([("g", f"value{i}") for i in range(2000)], ["source", "token"])
    row = K.kmv_distinct(df, "source", "token", k=64).collect()[0]
    assert row["n_kept"] == 64
    assert row["est_distinct"] == pytest.approx(2000, rel=0.4)


def test_kmv_duplicates_do_not_inflate(spark):
    a = spark.createDataFrame([("g", f"v{i}") for i in range(500)], ["source", "token"])
    b = a.union(a).union(a)  # 3× multiplicity
    ra = K.kmv_distinct(a, "source", "token", k=32).collect()[0]
    rb = K.kmv_distinct(b, "source", "token", k=32).collect()[0]
    assert ra["est_distinct"] == rb["est_distinct"]
    assert ra["kth_hash"] == rb["kth_hash"]


def test_kmv_two_level_merge_equals_single_window(spark, sf_dir):
    """The bucketed partial min-k merge must equal the naive global min-k."""
    from pyspark.sql import Window

    toks = _toks(spark, sf_dir)
    out = {
        r["group"]: (r["n_kept"], r["kth_hash"])
        for r in K.kmv_distinct(toks, "source", "token", k=16).collect()
    }
    hashed = toks.select(
        F.col("source").alias("group"), K._unit_hash(F.col("token")).alias("h")
    ).dropDuplicates(["group", "h"])
    w = Window.partitionBy("group").orderBy("h")
    naive = (
        hashed.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 16)
        .groupBy("group")
        .agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("kh"))
    )
    for r in naive.collect():
        assert out[r["group"]] == (r["n"], r["kh"])


def test_kmv_mergeability_union_of_shards(spark):
    """KMV of a union == KMV computed from the two shards' kept hash sets —
    the property that makes it a sketch (partial sketches combine)."""
    left = spark.createDataFrame([("g", f"L{i}") for i in range(300)], ["source", "token"])
    right = spark.createDataFrame([("g", f"R{i}") for i in range(300)], ["source", "token"])
    k = 24
    whole = K.kmv_distinct(left.union(right), "source", "token", k=k).collect()[0]
    # shard sketches: keep each shard's k smallest, then merge and re-cut
    import itertools

    def kept(df):
        rows = (
            df.select(K._unit_hash(F.col("token")).alias("h"))
            .distinct()
            .orderBy("h")
            .limit(k)
            .collect()
        )
        return [r["h"] for r in rows]

    merged = sorted(set(itertools.chain(kept(left), kept(right))))[:k]
    assert whole["kth_hash"] == merged[-1]
    assert whole["est_distinct"] == pytest.approx((k - 1) / merged[-1])


def test_top_keywords_basic_ranking(spark):
    rows = [
        (1, "apple apple apple rare banana banana common common"),
        (2, "common rare kiwi kiwi"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = T.top_keywords(df, k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["token"], r["tf"], r["df"]))
    # doc 1: apple tf=3 wins; banana and common both tf=2 → banana (df=1)
    # beats common (df=2)
    assert sorted(by_doc[1]) == [(1, "apple", 3, 1), (2, "banana", 2, 1)]
    # doc 2: kiwi tf=2 wins; common/rare tf=1, df equal → 'common' < 'rare'
    assert sorted(by_doc[2]) == [(1, "kiwi", 2, 1), (2, "common", 1, 2)]


def test_top_keywords_k_bound_and_schema(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = T.top_keywords(docs, k=3)
    assert out.columns == ["doc_id", "token", "tf", "df", "rank"]
    worst = out.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).agg(F.max("n")).collect()[0][0]
    assert worst <= 3
    assert out.filter(F.col("rank") > 3).count() == 0
