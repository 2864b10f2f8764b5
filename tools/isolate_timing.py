"""Isolated single-query timing: one FRESH Spark session per (query, sf)
run, nothing else on the box — separates structural scaling from
shared-session contention (VERDICT r8: semantic_dedup read 7.0× sf1→sf5
inside the 41-query bench session but 5.25× standalone; the bench's
starred sf1 rows were inflated by running right after two ~500 s LSH
audits in the same JVM).

Usage: python tools/isolate_timing.py QUERY SF_DIR [reps]
Prints one JSON line {"query":..., "sf_dir":..., "walls": [...], "rows": N}.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    name, sf_dir = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    import __spark_entry__ as entrymod
    from periodicity_spark import get_spark
    from periodicity_spark import session as _s

    spark = get_spark(f"isolate_{name}")
    # uncounted warm-up: JVM, scheduler, parquet footers
    spark.range(1).count()
    fn = entrymod.queries()[name]
    walls, rows = [], 0
    for _ in range(reps):
        for df in _s._PERSIST_MEMO.values():
            try:
                df.unpersist()
            except Exception:
                pass
        _s._PERSIST_MEMO.clear()
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).count()
        walls.append(round(time.perf_counter() - t0, 2))
    print(json.dumps({"query": name, "sf_dir": sf_dir, "walls": walls, "rows": rows}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
