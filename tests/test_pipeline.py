"""Pipeline operators: dedup recall, ANN recall (LSH + IVF vs brute force)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from periodicity_spark.pipeline import dedup, simsearch


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def _probes(emb):
    return emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )


def test_ivf_recall_vs_bruteforce(spark, emb):
    exact = simsearch.cosine_topk_bruteforce(emb, _probes(emb), k=5).toPandas()
    approx = simsearch.cosine_topk_ivf(
        emb, _probes(emb), k=5, n_centroids=8, n_probe=4
    ).toPandas()
    # recall@5 of the IVF path vs brute force
    hits = 0
    for qid in exact["qid"].unique():
        e = set(exact[exact["qid"] == qid]["vec_id"])
        a = set(approx[approx["qid"] == qid]["vec_id"])
        hits += len(e & a) / len(e)
    recall = hits / exact["qid"].nunique()
    assert recall >= 0.5  # n_probe=4 of 8 lists → at least half the truth


def test_lsh_candidates_subset_of_bruteforce_order(spark, emb):
    lsh = simsearch.cosine_topk_lsh(emb, _probes(emb), k=5, n_planes=6).toPandas()
    # ranks well-formed per qid
    for qid, g in lsh.groupby("qid"):
        assert list(g.sort_values("rank")["rank"]) == list(range(1, len(g) + 1))


def test_minhash_finds_planted_duplicates(spark):
    rng = np.random.default_rng(0)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "theta"]
    base = [" ".join(rng.choice(vocab, 40)) for _ in range(30)]
    texts = list(base)
    # plant two near-duplicates of doc 0 (minor token edits)
    dup1 = base[0].replace("alpha", "beta", 1)
    dup2 = base[0][: len(base[0]) // 2] + base[0][len(base[0]) // 2 :].replace("gamma", "zeta", 1)
    texts += [dup1, dup2]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    pairs = dedup.minhash_near_duplicates(docs, k=5, threshold=0.6).toPandas()
    found = set(map(tuple, pairs[["d1", "d2"]].to_numpy()))
    assert (0, 30) in found and (0, 31) in found
