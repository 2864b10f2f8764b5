"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed as a full action (plan → execute → count the result) —
cold plans, shared warm JVM, matching how the driver's per-round BENCH runs.
"""

from __future__ import annotations

import json
import os
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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark("bench")
    qs = entrymod.queries()

    # warm the JVM, scheduler, and parquet footers once (uncounted) so the
    # first timed query measures the engine, not one-time session costs
    spark.range(1).count()
    for t in ("events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
