"""Verdict for the sf5 cosine_neardup full-strength run, DuckDB-side.

The registered cosine oracle is the exact all-pairs SQL — O(n²) over 5M
vectors at sf5 (~12h in DuckDB), so the soak oracle phase excludes it.
This tool replaces it with the two checks that are exact without the
quadratic join, run directly against the soak phase's saved parquet:

1. ANALYTIC SET ORACLE (same construction as tools/sf5_cosine_check.py,
   r8 task #2): the corpus is emb ∪ its int8-quantized reconstruction
   (ids offset by 10⁷); every clean (finite, non-zero-scale) vector's
   twin sits at cosine ≈ 0.99998 while organic pairs sit ≈0.6, so the
   expected ≥0.99 pair set is EXACTLY {(v, v+10M)} for clean v — recall
   and false positives check without materializing all pairs. Cosine
   VALUES are additionally recomputed from the raw vectors for every
   emitted pair and compared to the engine's output at 1e-9.

2. PLAN EQUIVALENCE: the broadcast plan's parquet (cosine_neardup) and
   the shuffled fallback plan's parquet (cosine_neardup_fallback) are
   compared as multisets via EXCEPT ALL both ways — full-sf5 evidence
   that the two physical plans agree (the r9 audit's missing branch).

Usage: python tools/cosine_sf5_verdict.py SOAK_DIR EMB_PARQUET OUT.json
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    soak, emb, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    import duckdb

    con = duckdb.connect()
    con.sql("SET threads TO 16")
    t0 = time.time()
    con.sql(
        f"""CREATE TEMP TABLE expected AS
        SELECT vec_id AS d1, vec_id + 10000000 AS d2
        FROM (SELECT vec_id,
                     list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS scale
              FROM read_parquet('{emb}'))
        WHERE isfinite(scale) AND scale <> 0"""
    )
    con.sql(
        f"""CREATE TEMP TABLE got AS
        SELECT d1, d2, cosine
        FROM read_parquet('{soak}/cosine_neardup.parquet/*.parquet')"""
    )
    n_expected = con.sql("SELECT count(*) FROM expected").fetchone()[0]
    n_got = con.sql("SELECT count(*) FROM got").fetchone()[0]
    missed = con.sql(
        "SELECT count(*) FROM expected e LEFT JOIN got g USING (d1, d2) "
        "WHERE g.d1 IS NULL"
    ).fetchone()[0]
    extras = con.sql(
        "SELECT count(*) FROM got g LEFT JOIN expected e USING (d1, d2) "
        "WHERE e.d1 IS NULL"
    ).fetchone()[0]

    # recompute the cosine for every emitted pair from the raw vectors
    # (d2 is always the quantized twin: reconstruct it the same way)
    con.sql(
        f"""CREATE TEMP TABLE vecs AS
        SELECT vec_id,
               list_transform(embedding, x -> x::DOUBLE) AS v,
               list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS scale
        FROM read_parquet('{emb}')"""
    )
    bad_cos = con.sql(
        """SELECT count(*) FROM (
          SELECT g.cosine,
                 list_dot_product(a.v, q.qv)
                   / (sqrt(list_dot_product(a.v, a.v))
                      * sqrt(list_dot_product(q.qv, q.qv))) AS ref
          FROM got g
          JOIN vecs a ON a.vec_id = g.d1
          JOIN (SELECT vec_id + 10000000 AS vec_id,
                       list_transform(v, x -> round(x / scale * 127) / 127.0 * scale) AS qv
                FROM vecs WHERE isfinite(scale) AND scale <> 0) q
            ON q.vec_id = g.d2
        ) WHERE abs(cosine - round(ref, 6)) > 1e-9"""
    ).fetchone()[0]

    fb_diff = con.sql(
        f"""SELECT
          (SELECT count(*) FROM
            ((SELECT * FROM got) EXCEPT ALL
             (SELECT d1, d2, cosine
              FROM read_parquet('{soak}/cosine_neardup_fallback.parquet/*.parquet')))) +
          (SELECT count(*) FROM
            ((SELECT d1, d2, cosine
              FROM read_parquet('{soak}/cosine_neardup_fallback.parquet/*.parquet'))
             EXCEPT ALL (SELECT * FROM got)))"""
    ).fetchone()[0]

    verdict = {
        "expected_twins": n_expected,
        "emitted_pairs": n_got,
        "missed": missed,
        "false_positives": extras,
        "cosine_value_mismatches_gt_1e9": bad_cos,
        "broadcast_vs_fallback_multiset_diff": fb_diff,
        "wall_sec": round(time.time() - t0, 1),
        "ok": missed == 0 and extras == 0 and bad_cos == 0 and fb_diff == 0,
    }
    with open(out_path, "w") as fh:
        json.dump(verdict, fh, indent=1)
    print(json.dumps(verdict))
    return 0 if verdict["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
