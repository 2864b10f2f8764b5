"""Stage-by-stage profile of the dedup_minhash pipeline (guide §1).

Replays minhash_near_duplicates' stages with explicit noop-sink actions and
separate driver plan-build timers, so the ~4-6 s bench wall decomposes into
(plan build, census/persist, signature agg, candidate join, verify,
checkpoint). Incremental noop actions recompute cached upstreams, so read
the DELTAS, not the absolute walls. Ends with the real end-to-end query
wall in the same session for the denominator.

Usage: python tools/profile_minhash.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    import __spark_entry__ as em
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from periodicity_spark import get_spark
    from periodicity_spark import session as _s
    from periodicity_spark.pipeline import dedup

    spark = get_spark("profile_minhash")
    spark.range(1).count()
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    sc = spark.sparkContext
    for rep in range(reps):
        T: dict[str, float] = {}
        docs = em._docs(spark, sf_dir)

        t = time.perf_counter()
        d2 = dedup._spread_single_split(docs, key="doc_id")
        packed = dedup.char_shingles_packed(d2, k=5)
        T["build_packed_plan"] = time.perf_counter() - t

        sc.setJobDescription("census")
        t = time.perf_counter()
        packed = packed.persist(StorageLevel.MEMORY_AND_DISK)
        n_sh = packed.agg(F.sum(F.size("sh"))).first()[0] or 0
        T["census_action"] = time.perf_counter() - t

        t = time.perf_counter()
        exploded = packed.select("doc_id", F.explode("sh").alias("_z")).select(
            "doc_id",
            F.col("_z.s1").alias("shingle"),
            F.col("_z.s2").alias("shingle2"),
        )
        sig = dedup.minhash_signatures(exploded, n_hashes=16, r=4)
        T["build_sig_plan"] = time.perf_counter() - t

        sc.setJobDescription("sig")
        t = time.perf_counter()
        noop(sig)
        T["sig_noop"] = time.perf_counter() - t

        t = time.perf_counter()
        cand = dedup.lsh_candidate_pairs(sig, max_bucket=1000)
        T["build_cand_plan"] = time.perf_counter() - t
        sc.setJobDescription("cand")
        t = time.perf_counter()
        noop(cand)
        T["cand_noop"] = time.perf_counter() - t

        t = time.perf_counter()
        ver = dedup.jaccard_verify(
            cand, exploded, threshold=0.4, shingle_count=n_sh
        )
        T["build_verify_plan"] = time.perf_counter() - t
        sc.setJobDescription("verify")
        t = time.perf_counter()
        noop(ver)
        T["verify_noop"] = time.perf_counter() - t

        sc.setJobDescription("checkpoint")
        t = time.perf_counter()
        out = ver.localCheckpoint(eager=True)
        T["checkpoint"] = time.perf_counter() - t
        n = out.count()
        packed.unpersist()
        sc.setJobDescription(None)

        # reference: the real registered query, fresh memo
        for df in _s._PERSIST_MEMO.values():
            try:
                df.unpersist()
            except Exception:
                pass
        _s._PERSIST_MEMO.clear()
        t = time.perf_counter()
        em.queries()["dedup_minhash"](spark, sf_dir).count()
        T["end_to_end_query"] = time.perf_counter() - t
        _s._PERSIST_MEMO.clear()

        print(json.dumps({
            "rep": rep, "rows": n,
            **{k: round(v, 3) for k, v in T.items()},
        }), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
