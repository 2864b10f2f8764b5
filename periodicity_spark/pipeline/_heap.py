"""Broadcast-budget estimation shared by the LSH verify joins.

A broadcast hash relation is built in EVERY EXECUTOR'S heap (the driver
only hosts the serialized torrent blocks), so the budget must key on the
SMALLER of driver and executor memory: on a real cluster the executors
are usually the smaller side, and sizing against the driver alone can
pass a check that then OOMs each executor as it inflates the relation.
Local mode is the exception — executors live inside the driver JVM, so
``spark.executor.memory`` is ignored by Spark itself and the driver heap
is the only heap there is.

An unparseable (or absent) memory setting means the budget is UNKNOWN,
and unknown → do not auto-broadcast: the shuffled fallback plan is
always correct, just slower, while a wrong broadcast decision is an OOM.
(The previous per-callsite heuristics assumed 8 GiB on a parse failure,
which silently green-lit broadcasts on clusters configured with strings
like ``2048mb`` that the old regex did not accept.)

The payload estimate callers pass is the RAW column bytes; the broadcast
relation costs more than that once UnsafeRow headers, the
LongToUnsafeRowMap page array, and the in-flight serialized copy are
counted — ``HASH_RELATION_OVERHEAD`` carries that multiplier so call
sites state only what they know (rows × payload width).

Constants are CALIBRATED against a measured working point, not guessed:
the sf5 minhash verify broadcast (2×4.28 GB raw packed-array payload)
ran clean in a 48 GiB heap with ~11 GB resident, i.e. a true per-copy
overhead of ~1.3× and ~23% of heap used at peak. OVERHEAD=2.0 and
FRACTION=0.25 keep ≈3× headroom from that observed point (approve only
what would project to ≤ an eighth of the heap at the measured 1.3×),
while not refusing configurations the box demonstrably executes —
over-strict constants silently push scale runs onto the shuffled
fallback, whose disk footprint is the thing that actually kills
single-box soaks.
"""

from __future__ import annotations

import re

# raw column bytes → resident hash-relation bytes: UnsafeRow per-field
# headers and alignment + the map's key/page arrays + one transient
# serialized block while the torrent pieces are fetched (measured ~1.3×
# on the packed-array relation; 2.0 covers narrower rows, whose fixed
# per-row cost weighs more)
HASH_RELATION_OVERHEAD = 2.0

# the relation shares the heap with shuffle buffers, the columnar cache,
# and every other operator — cap all broadcast copies at a quarter of it
SAFETY_FRACTION = 0.25

# raw column bytes -> serialized task-result bytes during the broadcast
# build's driver-side collect (compact UnsafeRow stream + framing; the
# sf1 measurement bounds it: 858 MB raw under a 1024 MB cap)
RESULT_SIZE_OVERHEAD = 1.1

# Spark's HARD limit on one broadcast table (BroadcastExchangeExec's
# MAX_BROADCAST_TABLE_BYTES) — not a config, a SparkException at build
# time (observed: the sf5 packed-array relation built to exactly 8.0 GiB
# in an 80 GiB heap and aborted). Gate with a margin so a relation that
# would land near the edge is refused before the work is done.
MAX_BROADCAST_TABLE_BYTES = 8 * 2**30

_UNITS = {
    "": 1,
    "b": 1,
    "k": 2**10,
    "kb": 2**10,
    "m": 2**20,
    "mb": 2**20,
    "g": 2**30,
    "gb": 2**30,
    "t": 2**40,
    "tb": 2**40,
}


def parse_mem(s: object) -> int | None:
    """JVM-style memory string ('8g', '2048mb', '512m', '1073741824') →
    bytes, or None when it does not parse (callers treat None as "unknown
    budget", never as a default size)."""
    if s is None:
        return None
    m = re.fullmatch(r"\s*(\d+)\s*([kmgt]?b?)\s*", str(s).lower())
    if not m:
        return None
    return int(m.group(1)) * _UNITS[m.group(2)]


def broadcast_budget(spark) -> int:
    """Heap bytes available to host a broadcast relation: the driver heap
    in local mode (executors share the driver JVM), else
    min(driver, executor). 0 when any relevant setting is unparseable —
    auto modes then never broadcast."""
    drv = parse_mem(spark.conf.get("spark.driver.memory", "1g"))
    if drv is None:
        return 0
    master = ""
    try:
        master = spark.conf.get("spark.master", "") or ""
    except Exception:
        pass
    if master.startswith("local"):
        return drv
    exe = parse_mem(spark.conf.get("spark.executor.memory", "1g"))
    if exe is None:
        return 0
    return min(drv, exe)


def fits_broadcast(spark, payload_bytes: float, copies: int = 1) -> bool:
    """True when ``copies`` broadcast relations of ``payload_bytes`` raw
    column bytes each fit comfortably (overhead multiplier + safety
    fraction) in the binding heap. False on an unknown budget.

    Also gated on ``spark.driver.maxResultSize``: a broadcast relation is
    BUILT by collecting the child's task results to the driver, and that
    collect is capped by maxResultSize — a relation that clears the heap
    budget but exceeds the collect cap fails the JOB, not gracefully
    (observed: the sf5 packed-array relation, 4.3 GB raw, aborted under
    the 1 GB default cap that the sf1 relation squeaked under at
    858 MB). Each copy's raw payload must fit the cap with the same
    SERIALIZED-row margin (``RESULT_SIZE_OVERHEAD`` — compact rows, not
    the in-heap hash relation: the sf1 relation at 858 MB raw
    demonstrably collects under the 1 GB default cap, and this gate must
    not flip that working regime onto the fallback); 0/unset means
    unlimited, an
    unparseable value means unknown → do not broadcast. Raise
    ``SPARK_MAX_RESULT_SIZE`` alongside driver memory for single-box
    scale runs."""
    budget = broadcast_budget(spark)
    if not payload_bytes * copies * HASH_RELATION_OVERHEAD < budget * SAFETY_FRACTION:
        return False
    return max_single_broadcast(spark) >= payload_bytes


def max_single_broadcast(spark) -> float:
    """Largest RAW payload (bytes) one broadcast relation may carry under
    every binding limit: the heap budget for a single copy, Spark's hard
    8 GiB table cap (with margin), and the driver collect cap. 0 when the
    budget is unknown. This is the chunk-sizing primitive for the hybrid
    verify plan (shuffled build side + hash-chunked broadcast side)."""
    budget = broadcast_budget(spark)
    if budget <= 0:
        return 0.0
    allow = min(
        budget * SAFETY_FRACTION / HASH_RELATION_OVERHEAD,
        MAX_BROADCAST_TABLE_BYTES * 0.9 / HASH_RELATION_OVERHEAD,
    )
    try:
        mrs_setting = spark.conf.get("spark.driver.maxResultSize", "1g")
    except Exception:
        mrs_setting = "1g"
    if str(mrs_setting).strip() not in {"0", "0b"}:
        mrs = parse_mem(mrs_setting)
        if mrs is None:
            return 0.0
        allow = min(allow, mrs / RESULT_SIZE_OVERHEAD)
    return allow
