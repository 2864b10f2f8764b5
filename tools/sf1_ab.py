"""Isolated sf1 walls, one fresh session per (version, query).
Usage: python3 /tmp/sf1_ab.py /root/repo|/tmp/r10_base QUERY [QUERY...]"""
import json
import sys
import time

root = sys.argv[1]
sys.path.insert(0, root)
import __spark_entry__ as entrymod  # noqa: E402

assert entrymod.__file__.startswith(root)
from periodicity_spark import get_spark  # noqa: E402
from periodicity_spark import session as _s  # noqa: E402

spark = get_spark("sf1_ab")
spark.range(1).count()
sf_dir = "/root/repo/.scale/sf1"
qs = entrymod.queries()
out = {}
for name in sys.argv[2:]:
    for df in _s._PERSIST_MEMO.values():
        try:
            df.unpersist()
        except Exception:
            pass
    _s._PERSIST_MEMO.clear()
    t0 = time.perf_counter()
    n = qs[name](spark, sf_dir).count()
    out[name] = {"wall": round(time.perf_counter() - t0, 2), "rows": n}
    print(json.dumps({"version": root, "query": name, **out[name]}), flush=True)
spark.stop()
