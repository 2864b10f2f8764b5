"""One A/B suite for the docs/embeddings floor evidence: run a list of
queries ONCE each, in order, in one fresh session, against the tree rooted
at argv[1] — bench.py semantics (entry/persist memos live for the suite, so
dedup_components reuses dedup_minhash's pair memo exactly as the driver's
bench does). Alternate invocations over two checkouts (ABBA order) give the
interleaved same-box comparison; one JSON line per query goes to stdout.

Usage: python tools/floor_ab_suite.py ROOT SF_DIR TAG QUERY [QUERY...]
"""

import json
import sys
import time

root, sf_dir, tag = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, root)
import __spark_entry__ as entrymod  # noqa: E402

assert entrymod.__file__.startswith(root)
from periodicity_spark import get_spark  # noqa: E402

spark = get_spark("floor_ab")
spark.range(1).count()
for t in ("documents", "embeddings"):
    spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

qs = entrymod.queries()
total = 0.0
for name in sys.argv[4:]:
    t0 = time.perf_counter()
    n = qs[name](spark, sf_dir).count()
    w = round(time.perf_counter() - t0, 2)
    total += w
    print(json.dumps({"tag": tag, "root": root, "query": name,
                      "wall": w, "rows": n}), flush=True)
print(json.dumps({"tag": tag, "root": root, "query": "_suite_total",
                  "wall": round(total, 2), "rows": 0}), flush=True)
spark.stop()
