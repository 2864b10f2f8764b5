"""Distributed PCA: numpy differential, variance ordering, plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from periodicity_spark.pipeline import embedding


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def X(emb):
    pdf = emb.select("vec_id", "embedding").toPandas().sort_values("vec_id")
    return np.asarray([np.asarray(v, dtype=float) for v in pdf["embedding"]])


def _numpy_pca(X, k):
    mu = X.mean(axis=0)
    cov = np.cov(X - mu, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T.copy()
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mu, comps, evals[order]


def test_fit_matches_numpy(emb, X):
    mean, comps, ev = embedding.pca_fit(emb, k=6)
    mu_np, comps_np, ev_np = _numpy_pca(X, 6)
    np.testing.assert_allclose(mean, mu_np, atol=1e-9)
    np.testing.assert_allclose(ev, ev_np, atol=1e-7)
    # same sign convention on both sides → componentwise comparison is
    # valid; tolerance covers the engine's deliberate 1e-9 covariance
    # rounding amplified by the eigengap
    np.testing.assert_allclose(comps, comps_np, atol=2e-5)


def test_projection_variance_is_eigenvalue(emb, X):
    """Per-component sample variance of the projection equals the
    eigenvalue, and components are ordered by decreasing variance."""
    mean, comps, ev = embedding.pca_fit(emb, k=4)
    proj = embedding.pca_project(emb, mean, comps).toPandas()
    P = np.asarray([np.asarray(v) for v in proj["proj"]])
    var = P.var(axis=0, ddof=1)
    np.testing.assert_allclose(var, ev, rtol=1e-6)
    assert all(ev[i] >= ev[i + 1] for i in range(len(ev) - 1))


def test_projection_centered_and_complete(emb):
    mean, comps, _ = embedding.pca_fit(emb, k=3)
    proj = embedding.pca_project(emb, mean, comps)
    assert proj.count() == emb.count()
    P = np.asarray([np.asarray(v) for v in proj.toPandas()["proj"]])
    assert np.abs(P.mean(axis=0)).max() < 1e-9


def test_project_plan_has_no_shuffle(emb):
    """Projection is a pure map stage — no Exchange in the plan."""
    mean, comps, _ = embedding.pca_fit(emb, k=2)
    plan = embedding.pca_project(emb, mean, comps)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pca_preserves_neighborhoods_for_ann(spark):
    """Composition certificate in PCA's OWN regime: on a corpus with real
    low-rank structure (the testdata embeddings are near-isotropic, where
    NO 16-d subspace can carry 64 i.i.d. dims — measured recall there is
    ~0.28 and correctly so), brute-force cosine top-10 in the 16-d PCA
    space recovers the full-64-d neighborhood — the reduced space is a
    valid ANN pre-filter (4× fewer bytes per vector through every
    shuffle/broadcast of the simsearch family)."""
    from periodicity_spark.pipeline import simsearch

    rng = np.random.default_rng(7)
    basis = np.linalg.qr(rng.normal(size=(64, 10)))[0]  # 10-d signal subspace
    centers = rng.normal(size=(8, 10)) * 4.0
    rows = []
    for i in range(320):
        z = centers[i % 8] + rng.normal(size=10)
        v = basis @ z + rng.normal(size=64) * 0.05  # tiny isotropic noise
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    mean, comps, ev = embedding.pca_fit(emb, k=16)
    # the spectrum must actually expose the low-rank structure
    assert ev[9] > 50 * ev[10]
    proj = embedding.pca_project(emb, mean, comps).withColumnRenamed(
        "proj", "embedding"
    )
    probes_full = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    probes_proj = proj.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    exact = simsearch.cosine_topk_bruteforce(emb, probes_full, k=10).toPandas()
    red = simsearch.cosine_topk_bruteforce(proj, probes_proj, k=10).toPandas()
    hits = 0.0
    for qid in exact["qid"].unique():
        e = set(exact[exact["qid"] == qid]["vec_id"])
        a = set(red[red["qid"] == qid]["vec_id"])
        hits += len(e & a) / len(e)
    recall = hits / exact["qid"].nunique()
    assert recall >= 0.9, f"16-d PCA neighborhood recall@10 = {recall:.3f}"


def test_quantize_int8_roundtrip_error_and_ann_recall(spark, emb, X):
    """Quantization invariants: codes in [-127,127], per-component
    dequantization error ≤ scale/254 + float32 representation noise, and
    cosine top-10 over DEQUANTIZED vectors keeps recall ≥ 0.95 vs exact —
    the property that makes the 4× memory reduction usable for ANN."""
    from periodicity_spark.pipeline import simsearch
    from periodicity_spark.pipeline.embedding import quantize_int8

    qd = quantize_int8(emb)
    pdf = qd.select("vec_id", "scale", "qvec").toPandas().sort_values("vec_id")
    Q = np.asarray([np.asarray(v, dtype=np.int64) for v in pdf["qvec"]])
    scales = pdf["scale"].to_numpy()

    assert Q.min() >= -127 and Q.max() <= 127
    # per-vector scale really is max|x|
    np.testing.assert_allclose(scales, np.abs(X).max(axis=1), rtol=1e-6)
    # dequantized error bound: |x - q*scale/127| <= 0.5 * scale/127
    deq = Q * (scales[:, None] / 127.0)
    err = np.abs(deq - X)
    bound = 0.5 * scales[:, None] / 127.0 + 1e-6
    assert (err <= bound).all(), float(err.max())

    # ANN over dequantized vectors: recall@10 vs exact float cosine
    deq_df = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in zip(pdf["vec_id"], deq)],
        "vec_id long, embedding array<float>",
    )
    probes = lambda df: df.filter(F.col("vec_id") < 16).select(  # noqa: E731
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    exact = simsearch.cosine_topk_bruteforce(emb, probes(emb), k=10).toPandas()
    quant = simsearch.cosine_topk_bruteforce(deq_df, probes(deq_df), k=10).toPandas()
    hits = 0.0
    for qid in exact["qid"].unique():
        e = set(exact[exact["qid"] == qid]["vec_id"])
        a = set(quant[quant["qid"] == qid]["vec_id"])
        hits += len(e & a) / len(e)
    recall = hits / exact["qid"].nunique()
    assert recall >= 0.95, f"int8 ANN recall@10 = {recall:.3f}"


def test_quantize_int8_dirty_vectors_yield_null_not_crash(spark):
    """NaN/Inf components, zero vectors, and NULL vectors must produce
    NULL (or zero) codes — under ANSI mode an unguarded round(NaN) cast
    would abort the whole job on one dirty embedding."""
    from periodicity_spark.pipeline.embedding import quantize_int8

    rows = [
        (1, [0.5, -1.0, 0.25]),
        (2, [0.3, float("nan"), 0.1]),
        (3, [float("inf"), 1.0, 0.0]),
        (4, [0.0, 0.0, 0.0]),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    assert got[1]["qvec"] == [64, -127, 32] and abs(got[1]["scale"] - 1.0) < 1e-6
    assert got[2]["qvec"] is None and got[2]["scale"] is None
    assert got[3]["qvec"] is None and got[3]["scale"] is None
    assert got[4]["qvec"] == [0, 0, 0] and got[4]["scale"] == 0.0
    assert got[5]["qvec"] is None and got[5]["scale"] is None


def test_embed_quantize_contract_holds_on_dirty_vectors(spark, tmp_path):
    """The q_embed_quantize ↔ SQL_EMBED_QUANTIZE contract on DIRTY data:
    both sides must emit ZERO rows for NULL/NaN/Inf vectors (Spark's
    posexplode of a NULL qvec skips the vec; the oracle's WHERE
    isfinite(scale) mirrors it). The driver's testdata is clean, so only
    this test exercises the divergence ADVICE r5 flagged."""
    import duckdb

    import __spark_entry__ as entrymod
    from tools.selfcheck import compare

    rows = [
        (1, [0.5, -1.0, 0.25], 0),
        (2, [0.3, float("nan"), 0.1], 0),
        (3, [float("inf"), 1.0, 0.0], 1),
        (4, [0.0, 0.0, 0.0], 1),
        (5, None, 2),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    d = str(tmp_path / "sf")
    df.coalesce(1).write.parquet(f"{d}/embeddings.parquet")
    sdf = entrymod.queries()["embed_quantize"](spark, d).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS "
        f"SELECT * FROM read_parquet('{d}/embeddings.parquet/*.parquet')"
    )
    ddf = con.sql(entrymod.oracle_sql()["embed_quantize"]).df()
    con.close()
    problems = compare("embed_quantize", sdf, ddf)
    assert not problems, "; ".join(problems[:4])
    # only the clean vector (1) and the zero vector (4) survive
    assert sorted(sdf["vec_id"].unique()) == [1, 4]


def test_pca_fit_survives_ragged_vectors(spark):
    """A wrong-dimension vector in the corpus must be DROPPED by the moment
    kernel, not abort the Arrow stage (np.asarray on a ragged list raises —
    r6 ADVICE: the guard was asymmetric with pca_project's len(v)==d_in
    mask). The fit must equal the fit over only the clean rows."""
    rng = np.random.default_rng(3)
    X = rng.normal(size=(40, 6))
    rows = [(i, X[i].tolist(), 0) for i in range(40)]
    dirty = rows + [
        (100, [1.0, 2.0], 0),          # short
        (101, X[0].tolist() + [9.0], 0),  # long
        (102, None, 0),                # NULL
        (103, [float("nan")] * 6, 0),  # NaN
    ]
    sch = "vec_id long, embedding array<float>, label int"
    clean_fit = embedding.pca_fit(spark.createDataFrame(rows, sch), k=3)
    dirty_fit = embedding.pca_fit(spark.createDataFrame(dirty, sch), k=3)
    for a, b in zip(clean_fit, dirty_fit):
        np.testing.assert_allclose(a, b, atol=1e-9)


def test_unrolled_dot_norm_bit_identical_to_fold(spark):
    """The r11 unrolled codegen dot/norm (simsearch._dot_expr/_norm_expr)
    must be BIT-identical to the interpreted HOF folds they replace, for
    clean vectors AND every degenerate shape: the unrolled chain starts
    from the fold's 0.0 seed and adds left-to-right in element order, and
    off-dimension rows take the verbatim fold fallback. Compared as raw
    IEEE bit patterns (NaN == NaN, +0.0 != -0.0)."""
    import struct

    import numpy as np
    from pyspark.sql import functions as F

    from periodicity_spark.pipeline.simsearch import (
        _dot,
        _dot_expr,
        _norm,
        _norm_expr,
    )

    dim = 64
    rng = np.random.default_rng(11)
    rows = []
    for i in range(200):
        rows.append((i, [float(x) for x in rng.standard_normal(dim) * 10.0**rng.integers(-3, 3)],
                     [float(x) for x in rng.standard_normal(dim)]))
    # degenerate shapes: NaN/Inf elements, signed zeros, NULL elements,
    # NULL vectors, wrong dims (shorter/longer/empty/equal-short)
    rows += [
        (1000, [float("nan")] * dim, [1.0] * dim),
        (1001, [float("inf")] + [0.0] * (dim - 1), [1.0] * dim),
        (1002, [-0.0] * dim, [0.0] * dim),
        (1003, [0.0, -1.0] + [0.0] * (dim - 2), [5.0, 0.0] + [0.0] * (dim - 2)),
        (1004, [1.0] * dim, None),
        (1005, None, None),
        (1006, [1.0] * (dim - 1), [1.0] * dim),
        (1007, [1.0] * (dim + 1), [1.0] * (dim + 1)),
        (1008, [], []),
        (1009, [2.0] * 7, [3.0] * 7),
        (1010, [1.0, None, 3.0] + [1.0] * (dim - 3), [1.0] * dim),
    ]
    df = spark.createDataFrame(rows, "id long, a array<double>, b array<double>")
    out = df.select(
        "id",
        _dot(F.col("a"), F.col("b")).alias("dot_fold"),
        _dot_expr("a", "b", dim).alias("dot_fast"),
        _norm(F.col("a")).alias("n_fold"),
        _norm_expr("a", dim).alias("n_fast"),
    ).collect()

    def bits(v):
        return None if v is None else struct.pack("<d", v)

    for r in out:
        assert bits(r["dot_fold"]) == bits(r["dot_fast"]), (r["id"], r["dot_fold"], r["dot_fast"])
        assert bits(r["n_fold"]) == bits(r["n_fast"]), (r["id"], r["n_fold"], r["n_fast"])


def test_assign_with_vec_is_exact_passthrough(spark, sf_dir):
    """r11: assign_to_centroids(with_vec=True) lets ivf_centroids' Lloyd
    update and semantic_dedup's sided frame skip a corpus self-join per
    pass. The vector column must be an EXACT float64 pass-through (Arrow
    round-trip, no recomputation) and the (id, centroid) assignment must
    be identical to the with_vec=False path — in both exact and twolevel
    modes."""
    import numpy as np

    from periodicity_spark.pipeline.simsearch import (
        assign_to_centroids,
        ivf_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    rng = np.random.default_rng(3)
    cents = rng.standard_normal((300, dim))  # 300 ≥ min_twolevel_k for auto

    for mode in ("exact", "twolevel"):
        plain = {
            r["vec_id"]: r["centroid"]
            for r in assign_to_centroids(emb, cents, mode=mode).collect()
        }
        rich = assign_to_centroids(emb, cents, mode=mode, with_vec=True).collect()
        assert {r["vec_id"]: r["centroid"] for r in rich} == plain
        src = {r["vec_id"]: r["embedding"] for r in emb.collect()}
        for r in rich:
            assert list(r["embedding"]) == list(src[r["vec_id"]]), r["vec_id"]


def test_cosine_topk_lsh_matches_pre_r11_formulation(spark, sf_dir):
    """r11 changed cosine_topk_lsh's exact re-rank (unrolled dot/norm for
    the declared dim, NULL-cosine filter moved above the rank window).
    Differential: the pre-r11 formulation re-implemented verbatim (HOF
    fold dot/norm, pre-window isNotNull filter) must produce the same
    row set on the real sf embeddings."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from periodicity_spark.pipeline import simsearch as ss

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )

    corpus = ss._finite_rows(emb, "embedding")
    p_in = ss._finite_rows(probes, "qvec")
    bud = ss.multi_table_buckets(24, 4, 42, 64)
    csig = corpus.select(
        "vec_id", F.posexplode(bud(F.col("embedding"))).alias("table", "bucket")
    )
    psig = p_in.select(
        "qid", F.posexplode(bud(F.col("qvec"))).alias("table", "bucket")
    )
    cand = (
        csig.join(F.broadcast(psig), ["table", "bucket"])
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id")
        .distinct()
    )
    c = corpus.select(
        "vec_id",
        F.col("embedding").alias("_v"),
        ss._norm(F.col("embedding")).alias("_nv"),
    )
    p = p_in.select(
        "qid", F.col("qvec").alias("_q"), ss._norm(F.col("qvec")).alias("_nq")
    )
    pairs = cand.join(c, "vec_id").join(F.broadcast(p), "qid").select(
        "qid",
        "vec_id",
        ss._cosine(ss._dot(F.col("_q"), F.col("_v")), F.col("_nq"), F.col("_nv")).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("vec_id"))
    old = (
        pairs.filter(F.col("cosine").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("qid", "vec_id", "cosine", "rank")
    )

    new = ss.cosine_topk_lsh(emb, probes, k=5, dim=64)
    assert sorted(map(tuple, old.collect())) == sorted(map(tuple, new.collect()))
