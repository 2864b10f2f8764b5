"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: probes × corpus via a
broadcast of the (small) probe set — the corpus side never shuffles, so this
scales to any corpus size as a single scan. The LSH-bucketed variant is the
approximate scale path when the probe set is also huge: random-hyperplane
signatures turn the cross join into an equi-join on buckets.

All dot products run in double (element-wise cast before multiply) inside
JVM higher-order functions — no Python UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "qid",
    probe_vec_col: str = "qvec",
) -> DataFrame:
    """Exact top-k: → (qid, vec_id, cosine, rank). Probe set is broadcast;
    ranking is a per-qid window (ties broken by vec_id for determinism)."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("_v"),
        _norm(F.col(vec_col)).alias("_nv"),
    )
    p = probes.select(
        F.col(probe_id_col).alias("qid"),
        F.col(probe_vec_col).alias("_q"),
        _norm(F.col(probe_vec_col)).alias("_nq"),
    )
    pairs = c.join(F.broadcast(p), F.col("vec_id") != F.col("qid")).select(
        "qid",
        "vec_id",
        (_dot(F.col("_q"), F.col("_v")) / (F.col("_nq") * F.col("_nv"))).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "cosine", "rank")
    )


def random_hyperplane_signatures(
    vecs: DataFrame,
    n_planes: int = 16,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH for cosine: sign-pattern of dot products against n_planes fixed
    pseudo-random hyperplanes → (vec_id, bucket). Planes are deterministic
    (hash-based) literals compiled into the plan — no driver-side RNG state,
    same plan on every executor."""
    import hashlib

    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    sig: Column = F.lit(0).cast("long")
    for j in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[j]])
        d = _dot(plane, F.col(vec_col))
        sig = sig + F.when(d > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(0)
    return vecs.select(F.col(id_col).alias("vec_id"), sig.alias("bucket"))


def cosine_topk_lsh(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "qid",
    probe_vec_col: str = "qvec",
) -> DataFrame:
    """Approximate top-k: candidates = same LSH bucket, then exact cosine
    rank within candidates. Bucket join replaces the cross join."""
    csig = random_hyperplane_signatures(corpus, n_planes, seed, dim, id_col, vec_col)
    psig = random_hyperplane_signatures(
        probes, n_planes, seed, dim, probe_id_col, probe_vec_col
    ).withColumnRenamed("vec_id", "qid")
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v"), _norm(F.col(vec_col)).alias("_nv")).join(
        csig, "vec_id"
    )
    p = probes.select(F.col(probe_id_col).alias("qid"), F.col(probe_vec_col).alias("_q"), _norm(F.col(probe_vec_col)).alias("_nq")).join(
        psig, "qid"
    )
    pairs = c.join(
        F.broadcast(p),
        (c["bucket"] == p["bucket"]) & (F.col("vec_id") != F.col("qid")),
    ).select(
        "qid",
        "vec_id",
        (_dot(F.col("_q"), F.col("_v")) / (F.col("_nq") * F.col("_nv"))).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "vec_id", "cosine", "rank")
    )
