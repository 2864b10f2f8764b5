"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed as a full action (plan → execute → count the result) —
cold plans, shared warm JVM, matching how the driver's per-round BENCH runs.

Noise hygiene (round 4): the whole suite runs $SPARK_GRAFT_BENCH_REPS times
(default 3) inside one session and "queries" reports the PER-QUERY MEDIAN —
r2's numbers were ±50% load noise, which single-pass timing can't separate
from structural change. The raw per-rep numbers ship in "query_runs" and the
1-minute load average at start/end in "load_avg", so a future round can tell
machine pressure from regressions without cross-referencing old rounds.
The GLS periodogram memo is cleared between reps — every rep pays the same
cold materialization the anchors paid.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from periodicity_spark import get_spark

# headline set: the heavy distributed operators + one relational + pipeline ops
HEADLINE = [
    "gls_power",
    "gls_best_period",
    "stringlength",
    "pdm_theta",
    "acf_lag",
    "downsample_daily",
    "sessionize",
    "interpolate_linear",
    "tpch_q1",
    "dedup_minhash",
    "simsearch_topk",
    "text_stats",
    "simhash",
    # round-2 additions
    "simhash_neardup",
    "interp_nearest",
    "interp_spline",
    "tf_downsample",
    "mirror_fill",
    "gls_fast",
    "cosine_neardup",
    "ngram_jaccard",
    "psort_by_prominence",
    "pg_stats",
    # round-4 addition: the ANN scale path (multi-table LSH)
    "simsearch_lsh",
    # round-5 additions: GLS on the reference default (per-series) grid,
    # winnowing fingerprints (Arrow kernel), iterative near-dup clustering
    "gls_default_grid",
    "winnow_fp",
    "dedup_components",
    # Gopher repetition signals: HOF-array path, one scan, zero shuffles
    "repetition_stats",
    # exact per-series percentiles: one shuffle, JVM percentile aggregate
    "value_quantiles",
    # session continuation: contamination (winnow fp join), bigram-LM
    # scoring (vocab-sized count joins), SemDeDup (clustered pairwise)
    "decontaminate",
    "lm_score",
    "semantic_dedup",
    # session continuation: corpus-level duplicate-ngram scoring (one
    # gram-key shuffle), distributed PCA (Arrow moment pass + projection),
    # the 6-table broadcast star join
    "cross_dup",
    "pca_embed",
    "tpch_q5",
    # session 3: outer-join distribution (pre-agg before join), per-domain
    # quality quota (bounded-shuffle top-k), leak-safe split (components +
    # zero-shuffle hash projection)
    "tpch_q13",
    "domain_cap",
    "leak_split",
    # the Arrow per-series GLS strategy, same oracle as gls_power — the
    # bench shows the two exact strategies side by side
    "gls_arrow",
    # round 6: TPC-H Q15 (ReusedExchange revenue view) and CCNet-style
    # boilerplate removal (explode + two counts + reconstruct)
    "tpch_q15",
    "boilerplate_rm",
    # round 7: the two hardest relational shapes (decorrelated
    # exists/not-exists over one table; correlated scalar-min), the
    # profit 6-way join, the Reinsch smoothing spline (banded Arrow
    # kernel), and cosine_neardup is now the LSH quantized-twin audit
    # (same name above — plan changed from cartesian to bucket join)
    "tpch_q21",
    "tpch_q2",
    "tpch_q9",
    "interp_smooth",
]


def _clear_memo() -> None:
    """Unpersist the session persist-memo (GLS periodogram etc.) so each rep
    pays the same cold materialization (reps would otherwise reuse rep 1's
    persisted plan and report near-zero gls_* times, breaking the r1-r3
    anchors)."""
    from periodicity_spark import session as _s

    for df in _s._PERSIST_MEMO.values():
        try:
            df.unpersist()
        except Exception:
            pass
    _s._PERSIST_MEMO.clear()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    # scale-soak knob (unset = full headline, the driver's per-round mode):
    # at sf5 a few shuffle-bound queries exceed the BOX'S DISK (dedup_minhash
    # shuffles ~300 GB of shingle arrays there) — the skip list lets the
    # sf1/sf5 scaling runs cover everything that physically fits, loudly
    headline = list(HEADLINE)
    skip = {
        s for s in os.environ.get("SPARK_GRAFT_BENCH_SKIP", "").split(",") if s
    }
    if skip:
        print(f"# skipping (SPARK_GRAFT_BENCH_SKIP): {sorted(skip)}", file=sys.stderr)
        headline = [n for n in headline if n not in skip]
    spark = get_spark("bench")
    qs = entrymod.queries()

    # warm the JVM, scheduler, and parquet footers once (uncounted) so the
    # first timed query measures the engine, not one-time session costs
    spark.range(1).count()
    for t in ("events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    load_start = os.getloadavg()[0]
    runs: dict[str, list[float]] = {name: [] for name in headline}
    for rep in range(reps):
        _clear_memo()
        for name in headline:
            fn = qs[name]
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 3)
            runs[name].append(dt)
            print(f"# rep{rep} {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)
    load_end = os.getloadavg()[0]

    timings = {name: round(statistics.median(ts), 3) for name, ts in runs.items()}
    total = round(sum(timings.values()), 3)
    line = json.dumps(
        {
            "metric": "headline_suite_runtime",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "query_runs": runs,
            "reps": reps,
            "load_avg": {"start": round(load_start, 2), "end": round(load_end, 2)},
            "sf": sf,
        }
    )
    print(line)
    # ALSO write the identical JSON to a file: the stdout contract line
    # grows with the query count (query_runs), and round 9's line
    # overflowed the driver's 2000-char output-tail capture, losing the
    # whole round-over-round comparison (BENCH_r09 parsed=null). The file
    # is a capture-proof twin — stdout stays the contract, byte-identical.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_LAST.json"), "w") as fh:
            fh.write(line + "\n")
    except OSError:
        pass  # a read-only checkout must not fail the bench
    spark.stop()


if __name__ == "__main__":
    main()
