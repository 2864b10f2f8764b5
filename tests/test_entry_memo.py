"""Driver-overhead memos added in optimization round 1 (guide §5):

- entry DataFrames (_ts/_docs/_emb) are memoized per (session, sf_dir) —
  the SAME immutable plan object is returned, so ~45 bench queries skip
  rebuilding the identical unresolved subtree over py4j and
  scan_parallel's partition probe reuses the Dataset's cached RDD;
- _gls_pg routes through persisted_lazy, so the five sibling queries
  sharing the periodogram memo skip the ~0.6 s plan rebuild on a hit;
- downsample_tf(assume_parallel=True) lets a caller that already floored
  the SOURCE partitioning (before a narrow expansion) skip the probe.

These are plan-construction changes only; every test here pins that the
RESULTS are unchanged by the memo/probe path taken.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from periodicity_spark import session as _s


def test_entry_frames_memoized_per_session_and_sfdir(spark, sf_dir):
    a = entrymod._ts(spark, sf_dir)
    b = entrymod._ts(spark, sf_dir)
    assert a is b, "same (session, sf_dir) must return the SAME plan object"
    d1 = entrymod._docs(spark, sf_dir)
    assert entrymod._docs(spark, sf_dir) is d1
    e1 = entrymod._emb(spark, sf_dir)
    assert entrymod._emb(spark, sf_dir) is e1
    # distinct sf_dirs must NOT share a plan (a trailing-slash alias is a
    # different key on purpose — the memo never guesses path identity)
    other = sf_dir.rstrip("/") + "/"
    assert entrymod._ts(spark, other) is not a


def test_gls_pg_memo_hit_skips_rebuild(spark, sf_dir):
    # populate, then count builder invocations via the persist memo: a hit
    # must return the SAME persisted DataFrame without rebuilding the plan
    pg1 = entrymod._gls_pg(spark, sf_dir)
    n_entries = len(_s._PERSIST_MEMO)
    pg2 = entrymod._gls_pg(spark, sf_dir)
    assert pg2 is pg1
    assert len(_s._PERSIST_MEMO) == n_entries


def test_downsample_tf_assume_parallel_rows_identical(spark, sf_dir):
    from pyspark.sql import functions as F

    from periodicity_spark.operators import resample as ops_resample
    from periodicity_spark.session import scan_parallel

    ts = entrymod._ts(spark, sf_dir)
    freqs = spark.createDataFrame(
        [(0.5,), (1.0,), (2.0,), (4.0,), (8.0,)], "frequency double"
    )

    def tf_from(src):
        return src.crossJoin(F.broadcast(freqs)).select(
            "series_id",
            "time",
            "frequency",
            F.floor(F.col("value") * F.col("value") / F.col("frequency"))
            .cast("double")
            .alias("power"),
        )

    guarded = ops_resample.downsample_tf(tf_from(ts), dt=2.0, df_=0.5)
    floored = ops_resample.downsample_tf(
        tf_from(scan_parallel(ts)), dt=2.0, df_=0.5, assume_parallel=True
    )
    a = sorted(map(tuple, guarded.collect()))
    b = sorted(map(tuple, floored.collect()))
    assert a == b
