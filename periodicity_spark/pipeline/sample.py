"""Deterministic sampling, dataset mixing, sequence packing, PII scrubbing.

The training-data-curation stages that sit between dedup/quality-filter and
the tokenizer: reproducible train/val/test splits, per-source mixture
re-weighting, packing documents into fixed-token-budget chunks, and regex
redaction. Everything is hash-deterministic (re-running on the same corpus
yields the same split/sample — a hard requirement for data lineage), and
everything except the tiny per-source rate table is a pure projection or
filter: no corpus-sized shuffle anywhere.

Hash convention: 60-bit integer from the first 15 hex chars of md5 (same
idiom as pipeline/dedup.py shingles), reduced mod 1_000_000 to a uniform
bucket. Bit-identical in DuckDB via ('0x' || substr(md5(x),1,15))::BIGINT,
so every operator here is exactly SQL-oracle-able.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

MIX_DENOM = 1_000_000


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform deterministic bucket in [0, 1_000_000) from any key column.

    md5 of the salted decimal/string form → first 15 hex chars as a 60-bit
    int → mod 1e6. Salting decorrelates independent decisions (the split
    assignment and a downstream subsample must not reuse the same bits, or
    the subsample would be biased within splits).
    """
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % MIX_DENOM


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose hash bucket
    falls below rate·1e6. Reproducible (unlike df.sample), stable under
    repartitioning, and a pure pushdown-able filter — zero shuffle."""
    return df.filter(hash_bucket(F.col(key_col), salt) < int(rate * MIX_DENOM))


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Assign every row to a named split by cumulative weight thresholds over
    the hash bucket: {'train': .9, 'val': .05, 'test': .05} → buckets
    [0, 900000) / [900000, 950000) / [950000, 1e6). Adds a ``split`` column.

    One projection, no shuffle; the assignment is a property of the row key,
    so late-arriving data lands in the same split it always would have.
    """
    total = sum(weights.values())
    bucket = hash_bucket(F.col(key_col), salt)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = bucket < int(acc * MIX_DENOM)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", split)


def dataset_mix(
    df: DataFrame,
    target: dict[str, float],
    group_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Deterministically downsample each group so the surviving corpus
    matches a target mixture (e.g. {'src0': .5, 'src1': .3, 'src2': .2})
    at the largest size the data supports.

    Let n_g be each group's row count. The binding group is the one with
    the smallest n_g / w_g; scaling to it gives per-group keep rates
    r_g = w_g · scale / n_g ≤ 1 (the binding group keeps everything).
    Rows are kept by hash bucket < floor(r_g · 1e6) — reproducible, and
    groups absent from ``target`` are dropped.

    Scale shape: one tiny per-group count aggregate (rows = #groups), the
    rate table broadcast-joins back onto the corpus, and the keep filter is
    a projection. The corpus itself never shuffles.
    """
    wmap = F.create_map(
        *[x for k, v in target.items() for x in (F.lit(k), F.lit(float(v)))]
    )
    counts = (
        df.filter(F.col(group_col).isin(list(target)))
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_w", wmap[F.col(group_col)])
    )
    scale = counts.agg(F.min(F.col("_n") / F.col("_w")).alias("_scale"))
    rates = counts.crossJoin(F.broadcast(scale)).select(
        group_col,
        F.floor(F.col("_w") * F.col("_scale") / F.col("_n") * MIX_DENOM)
        .cast("long")
        .alias("_keep_below"),
    )
    bucket = hash_bucket(F.col(key_col), salt)
    return (
        df.join(F.broadcast(rates), group_col)
        .filter(bucket < F.col("_keep_below"))
        .drop("_keep_below")
    )


def uniform_sample_k(
    df: DataFrame, k: int, key_col: str = "doc_id", salt: str = "uk"
) -> DataFrame:
    """Exactly-k deterministic uniform sample: the k rows whose salted md5
    is smallest (ties — only possible for duplicate keys — broken by the
    key). Unlike ``df.sample`` this is reproducible and returns exactly k
    rows; unlike a reservoir it is order- and partitioning-independent.

    Scale shape: ``orderBy(hash).limit(k)`` compiles to
    TakeOrderedAndProject — each partition keeps its local k smallest and
    the driver merges k × partitions candidates. No global sort, no
    shuffle of the corpus.
    """
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    return (
        df.withColumn("_h", h)
        .orderBy(F.col("_h"), F.col(key_col))
        .limit(k)
        .drop("_h")
    )


def leak_safe_split(
    docs: DataFrame,
    components: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Train/val/test split that cannot leak near-duplicates across the
    boundary: the split hash is keyed by the document's near-dup
    COMPONENT representative (``components``: (doc_id, component_id) from
    ``dedup.connected_components``), so every member of a duplicate
    cluster lands in the same split. Documents absent from ``components``
    are singletons keyed by their own id — identical to ``hash_split``
    for them.

    Scale shape: one equi-join docs ⋈ components on the doc key, then the
    same zero-shuffle hash projection as ``hash_split``. The components
    side holds only CLUSTERED docs (a fraction of the corpus) but reaches
    the join as a localCheckpointed RDD scan with no size statistics —
    static planning would pick a SortMergeJoin and AQE cannot re-promote
    a checkpoint scan — so the join is hinted SHUFFLE_HASH: the corpus is
    hash-partitioned but never SORTED, and the hash table builds on the
    smaller components side.
    """
    comp = components.select(
        F.col("doc_id").alias(id_col), F.col("component_id")
    ).hint("shuffle_hash")
    keyed = docs.join(comp, on=id_col, how="left").withColumn(
        "_split_key", F.coalesce(F.col("component_id"), F.col(id_col))
    )
    out = hash_split(keyed, weights, key_col="_split_key", salt=salt)
    return out.drop("_split_key", "component_id")


def domain_cap(
    docs: DataFrame,
    n: int,
    group_col: str = "source",
    order_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-domain quota: keep at most ``n`` documents per ``group_col``,
    highest ``order_col`` first (defaults to the composite quality score),
    ties broken by ``id_col`` ascending. The standard over-represented-
    domain guard in corpus curation (cap crawl-heavy domains so they can't
    dominate the mixture regardless of their raw volume).

    → (group_col, id_col, order_col, rank), rank 1..n within each domain.

    Scale shape: routed through ``topk_per_key`` — a zero-shuffle Arrow
    local top-n per input partition, then a window over the surviving
    ≤ n × partitions candidates per domain. A hot domain with 10⁹ docs
    contributes n rows per partition to the shuffle, not 10⁹; the naive
    row_number window would sort the whole domain on one reducer.
    """
    from periodicity_spark.operators.topk import topk_per_key

    if order_col is None:
        # score inline (one projection over the scan) — joining a separate
        # quality_score() result back would shuffle the corpus for an
        # equi-join with itself
        from periodicity_spark.pipeline.text import _quality_expr, _tokens

        order_col = "quality"
        docs = docs.select(
            F.col(group_col),
            F.col(id_col),
            _quality_expr(_tokens("text")).alias("quality"),
        )
    capped = topk_per_key(
        docs.select(group_col, id_col, order_col),
        [group_col],
        order_col,
        n,
        descending=True,
        tie_cols=[id_col],
        rank_col="rank",
    )
    return capped.select(group_col, id_col, order_col, "rank")


def pack_chunks(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
    bucket_width: int = 8192,
) -> DataFrame:
    """GPT-style sequence packing: concatenate each group's documents in
    key order into one token stream and cut it every ``budget`` tokens.
    → (group, key, n_tokens, offset, chunk) where ``offset`` is the doc's
    start position in the stream and ``chunk`` = offset div budget.

    A naive rank-window cumsum over a whole group serializes the group
    through ONE task — the classic 100 TB bottleneck. This is instead a
    two-phase distributed prefix sum:

      1. rows bucket by ``key div bucket_width`` (any monotone numeric key);
         per-bucket token totals are ONE tiny aggregate (rows = #buckets);
      2. the exclusive prefix over bucket totals is a cumsum window on that
         tiny table (driver-scale, broadcast back);
      3. within each bucket a window cumsum runs in parallel across buckets,
         and offset = bucket_prefix + intra_bucket_cumsum.

    Work per task is bounded by bucket_width regardless of group size.
    """
    from pyspark.sql import Window

    n_tokens = (
        F.col(tokens_col)
        if tokens_col is not None
        else F.size(F.split(F.col(text_col), " "))
    )
    base = df.select(
        F.col(group_col).alias("group"),
        F.col(key_col).alias("key"),
        n_tokens.cast("long").alias("n_tokens"),
    ).withColumn("_bkt", (F.col("key") / F.lit(bucket_width)).cast("long"))

    btot = base.groupBy("group", "_bkt").agg(F.sum("n_tokens").alias("_bt"))
    wb = (
        Window.partitionBy("group")
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = btot.select(
        "group", "_bkt", F.coalesce(F.sum("_bt").over(wb), F.lit(0)).alias("_pre")
    )

    wi = (
        Window.partitionBy("group", "_bkt")
        .orderBy("key")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = (
        base.join(F.broadcast(prefix), ["group", "_bkt"])
        .withColumn(
            "offset", F.col("_pre") + F.coalesce(F.sum("n_tokens").over(wi), F.lit(0))
        )
        .withColumn("chunk", F.floor(F.col("offset") / F.lit(budget)).cast("long"))
    )
    return packed.select("group", "key", "n_tokens", "offset", "chunk")


# Patterns deliberately restricted to syntax shared by Java regex and RE2
# (no backreferences, no lookaround) so the same pattern string drives both
# the engine and a DuckDB oracle.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Redact PII-shaped spans with <TYPE> placeholders: emails, phone
    numbers, IPv4 addresses. Chained regexp_replace — pure per-row JVM
    expression, whole-stage codegen, no Python, no shuffle.

    Order matters: emails before phones/IPs (an email's domain must not be
    half-eaten by the IP pattern first).
    """
    pats = patterns or PII_PATTERNS
    col = F.col(text_col)
    for name, pat in pats.items():
        col = F.regexp_replace(col, pat, f"<{name.upper()}>")
    return df.withColumn(out_col or text_col, col)


def pps_sample(
    docs: DataFrame,
    k: int,
    group_col: str = "source",
    weight_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Systematic probability-proportional-to-size sampling, per domain:
    walk each domain's documents in ``id_col`` order accumulating weight
    and take one document every total_weight/k — each doc's inclusion
    probability is proportional to its weight (quality by default), the
    sample is EXACTLY deterministic (no RNG), and every domain yields ≤ k
    docs. The classic PPS design for quality-weighted corpus subsampling:
    unlike a weighted Bernoulli it hits the target size, unlike top-k it
    keeps probability mass on mid-quality docs.

    Selection rule: doc with cumulative weight window (cum−w, cum] is
    taken iff floor(cum/step) > floor((cum−w)/step), step = total/k —
    i.e. its weight interval contains a multiple of step. Docs heavier
    than step are taken exactly once (systematic sampling's bounded
    variant).

    Scale shape: one shuffle keyed by ``group_col`` for the per-domain
    ordered window (cumulative sum + total); skew is bounded by the
    domain cap upstream. The global-corpus variant would need a
    distributed prefix sum — per-domain windows are the natural
    stratification and keep every window partition-sized. All arithmetic
    is an ordered left-to-right double cumsum, bit-identical to the SQL
    window oracle.

    → (group_col, id_col, weight): the selected docs only (the internal
    cum/take audit columns are dropped).
    """
    if weight_col is None:
        from periodicity_spark.pipeline.text import _quality_expr, _tokens

        docs = docs.select(
            F.col(group_col),
            F.col(id_col),
            _quality_expr(_tokens("text")).alias("_w"),
        )
    else:
        docs = docs.select(
            F.col(group_col), F.col(id_col), F.col(weight_col).alias("_w")
        )
    w = Window.partitionBy(group_col).orderBy(id_col)
    wall = Window.partitionBy(group_col)
    # step derives from max(cum) — the SEQUENTIAL total — not a separate
    # whole-partition sum: engines are free to sum a partition pairwise,
    # which lands 1 ulp off the running sum's last value and flips the
    # final floor(total/step)==k boundary between them
    cummed = docs.select(
        group_col,
        id_col,
        F.col("_w").alias("weight"),
        F.sum("_w").over(w).alias("cum"),
    )
    step = F.max("cum").over(wall) / F.lit(float(k))
    # try_divide: a domain whose TOTAL weight is 0 (e.g. all-empty docs
    # with quality 0) has step = 0 — there is no probability mass to
    # sample, so every take comparison is NULL and the domain yields no
    # rows, instead of an ANSI divide-by-zero aborting the job
    out = cummed.withColumn(
        "take",
        F.floor(F.try_divide(F.col("cum"), step))
        > F.floor(F.try_divide(F.col("cum") - F.col("weight"), step)),
    )
    return out.filter("take").drop("take", "cum")
