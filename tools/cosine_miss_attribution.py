"""Attribute the sf5 cosine twin misses to their pipeline-stage cause,
independently of Spark (pure NumPy re-derivation of the LSH candidate
stage at the registered parameters: n_planes=240, bands=10, seed=42,
max_bucket=1000, min_bands=2).

For every expected twin pair absent from the engine output, recompute
both vectors' band signatures (same default_rng(seed) hyperplanes as
pipeline/simsearch.hyperplane_band_signatures) and all corpus bucket
sizes, then count:
  bands_sig_match      bands where raw and quantized twin share the sig
  bands_surviving_cap  those of them whose bucket is <= max_bucket on
                       BOTH members' rows (the capped filter drops rows,
                       so a pair needs the shared bucket under cap)
A miss is EXPLAINED iff bands_surviving_cap < min_bands; the split
between sig-flip misses (bands_sig_match < 2) and cap misses
(bands_sig_match >= 2 > bands_surviving_cap) is reported per pair.

Usage: python tools/cosine_miss_attribution.py EMB_PARQUET SOAK_DIR OUT.json
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    emb_path, soak, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    import duckdb
    import numpy as np

    t0 = time.time()
    n_planes, bands, seed, dim = 240, 10, 42, 64
    max_bucket, min_bands = 1000, 2
    r = n_planes // bands

    con = duckdb.connect()
    con.sql("SET threads TO 8")
    raw = con.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{emb_path}') ORDER BY vec_id"
    ).fetchnumpy()
    ids = raw["vec_id"].astype(np.int64)
    X = np.stack([np.asarray(v, dtype=np.float64) for v in raw["embedding"]])
    scale = np.abs(X).max(axis=1)
    clean = np.isfinite(scale) & (scale != 0)
    # quantized twins, ids offset by 10M — same reconstruction as the query
    Q = np.round(X[clean] / scale[clean, None] * 127) / 127.0 * scale[clean, None]
    qids = ids[clean] + 10_000_000

    planes = np.random.default_rng(seed).standard_normal((n_planes, dim))
    weights = np.int64(1) << np.arange(r, dtype=np.int64)

    def band_sigs(M):
        S = (M @ planes.T) > 0
        return np.stack(
            [S[:, j * r : (j + 1) * r] @ weights for j in range(bands)], axis=1
        )  # n × bands

    sig_raw = band_sigs(X)          # corpus raw vectors
    sig_q = band_sigs(Q)            # quantized twins
    all_ids = np.concatenate([ids, qids])
    all_sigs = np.concatenate([sig_raw, sig_q])  # n_all × bands

    # bucket sizes per (band, sig): encode band in the top bits
    keys = (all_sigs.astype(np.uint64) << np.uint64(4)) | np.arange(
        bands, dtype=np.uint64
    )
    uniq, inv, counts = np.unique(keys.ravel(), return_inverse=True, return_counts=True)
    over_cap = counts > max_bucket
    row_capped = over_cap[inv].reshape(keys.shape)  # n_all × bands

    # expected twins absent from the engine output
    got = con.sql(
        f"SELECT d1 FROM read_parquet('{soak}/cosine_neardup.parquet/*.parquet') "
        "WHERE d2 = d1 + 10000000"
    ).fetchnumpy()["d1"].astype(np.int64)
    missing = np.setdiff1d(ids[clean], got)

    pos_raw = {int(v): i for i, v in enumerate(ids)}
    pos_q = {int(v): i for i, v in enumerate(qids)}
    idx_q_base = len(ids)
    pairs = []
    unexplained = 0
    for v in missing.tolist():
        i, jq = pos_raw[v], pos_q[v + 10_000_000]
        match = sig_raw[i] == sig_q[jq]
        capped = row_capped[i] | row_capped[idx_q_base + jq]
        surviving = int((match & ~capped).sum())
        rec = {
            "d1": int(v),
            "bands_sig_match": int(match.sum()),
            "bands_surviving_cap": surviving,
            "cause": (
                "sig_flip" if match.sum() < min_bands
                else "bucket_cap" if surviving < min_bands
                else "UNEXPLAINED"
            ),
        }
        if rec["cause"] == "UNEXPLAINED":
            unexplained += 1
        pairs.append(rec)

    verdict = {
        "n_missing": len(pairs),
        "n_unexplained": unexplained,
        "by_cause": {
            c: sum(1 for p in pairs if p["cause"] == c)
            for c in {"sig_flip", "bucket_cap", "UNEXPLAINED"}
        },
        "pairs": pairs,
        "corpus_capped_buckets": int(over_cap.sum()),
        "corpus_capped_sig_rows": int(counts[over_cap].sum()),
        "wall_sec": round(time.time() - t0, 1),
        "ok": unexplained == 0,
    }
    with open(out_path, "w") as fh:
        json.dump(verdict, fh, indent=1)
    print(json.dumps({k: verdict[k] for k in
                      ("n_missing", "by_cause", "corpus_capped_buckets",
                       "corpus_capped_sig_rows", "wall_sec", "ok")}))
    return 0 if verdict["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
