"""Torture-table robustness net: EVERY contract query must run (possibly to
an empty result) against a minimal adversarial dataset — 1-row series,
constant series, all-NULL series, NaN values, duplicate timestamps, a short
series with a huge sampling gap (the shape that crashed lmd at sf0.1 in r6),
empty/whitespace/unicode documents, NULL/NaN/Inf/zero embeddings, NULL keys
and dates in the relational tables.

This is a NO-CRASH + stable-schema gate, not a value oracle: the driver's
correctness gate runs on clean data, so a kernel that aborts a whole Spark
stage on one degenerate row (the production failure mode at 100 TB, where
every pathological shape exists somewhere) is otherwise invisible until it
takes down a real job.
"""

from __future__ import annotations

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

REAL = "/root/testdata/sf0.001"
NAN = float("nan")


@pytest.fixture(scope="module")
def torture_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("torture"))

    def schema_of(table):
        return spark.read.parquet(f"{REAL}/{table}.parquet").schema

    def _as_single_file(df, table):
        # the driver's layout is ONE parquet FILE per table (not a
        # directory) — the streaming readers' pathGlobFilter depends on it
        import glob
        import shutil

        tmp = f"{out}/_tmp_{table}"
        df.coalesce(1).write.parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.move(part, f"{out}/{table}.parquet")
        shutil.rmtree(tmp)

    def write(table, rows):
        _as_single_file(spark.createDataFrame(rows, schema_of(table)), table)

    # small coherent dimension slices straight from the real data
    for dim in ("region", "nation", "customer", "supplier", "part"):
        _as_single_file(spark.read.parquet(f"{REAL}/{dim}.parquet").limit(5), dim)

    import datetime as dt

    def t(s):
        return dt.datetime.fromisoformat(s)

    write(
        "orders",
        [
            (1, 1, "O", 100.0, t("1996-01-05 00:00:00"), "1-URGENT"),
            (2, 2, "F", None, t("1996-02-05 00:00:00"), "2-HIGH"),
            (3, 1, "F", 50.0, None, "3-MEDIUM"),
            (4, None, "O", 10.0, t("1997-01-05 00:00:00"), "4-NOT SPECIFIED"),
        ],
    )
    write(
        "lineitem",
        [
            (1, 1, 1, 1, 5.0, 100.0, 0.05, 0.02, "N", "O", t("1996-01-10 00:00:00")),
            (1, 2, 2, 2, None, 200.0, 0.0, 0.0, "R", "F", t("1996-02-10 00:00:00")),
            (2, 1, 1, 1, 3.0, None, None, 0.01, "A", "F", t("1996-03-10 00:00:00")),
            (3, 2, 2, 1, 7.0, 70.0, 0.07, 0.03, "N", "O", None),
            (4, None, None, 2, 1.0, 10.0, 0.1, 0.0, "R", "F", t("1996-01-20 00:00:00")),
        ],
    )

    ev = []
    eid = [0]

    def e(ts, user, typ, value, props='{"k": 1}'):
        eid[0] += 1
        tv = t(ts) if ts else None
        ev.append((eid[0], tv, user, typ, value, props))

    # u1/A: a single-row series
    e("2024-01-01 00:00:00", 1, "A", 1.0)
    # u1/B: constant series, 20 regular points (sigma == 0 paths)
    for i in range(20):
        e(f"2024-01-{i + 1:02d} 06:00:00", 1, "B", 5.0)
    # u2/A: the lmd crash shape — tiny dt clusters separated by a huge gap
    for i in range(5):
        e(f"2024-01-01 00:0{i}:00", 2, "A", (-1.0) ** i)
    for i in range(5):
        e(f"2024-03-01 00:0{i}:00", 2, "A", (-1.0) ** (i + 1))
    # u2/B: all values NULL
    for i in range(10):
        e(f"2024-01-{i + 1:02d} 12:00:00", 2, "B", None)
    # u3/A: NaN values mixed with real ones
    for i in range(10):
        e(f"2024-01-{i + 1:02d} 18:00:00", 3, "A", NAN if i % 3 == 0 else float(i))
    # u3/B: duplicate timestamps
    e("2024-01-05 00:00:00", 3, "B", 1.0)
    e("2024-01-05 00:00:00", 3, "B", 2.0)
    e("2024-01-06 00:00:00", 3, "B", 3.0)
    # u4/A: a normal healthy series so non-degenerate paths execute too
    for i in range(40):
        e(
            f"2024-01-{(i % 28) + 1:02d} {i % 24:02d}:30:00",
            4,
            "A",
            math.sin(i / 3.0) + 0.1 * i,
        )
    # NULL key / NULL ts / NULL type rows + invalid JSON props
    e("2024-01-02 00:00:00", None, "A", 1.0)
    e(None, 4, "B", 2.0)
    e("2024-01-03 00:00:00", 4, None, 3.0, None)
    e("2024-01-04 00:00:00", 4, "B", 4.0, "{not json")
    write("events", ev)

    write(
        "documents",
        [
            (0, "", "en", "s0", 0),
            (1, "x", "en", "s0", 1),
            (2, "   ", "en", "s0", 3),
            (3, "the quick brown fox jumps over the lazy dog", "en", "s1", 44),
            (4, "the quick brown fox jumps over the lazy dog", "en", "s1", 44),
            (5, "aaaaa aaaaa aaaaa aaaaa aaaaa aaaaa", "en", "s1", 35),
            (6, "χρόνος älter жизнь 时间 emoji \U0001f600 text", "de", "s2", 40),
            (7, None, None, "s2", None),
            (8, "le chat noir dort sur le tapis rouge et le chien", "fr", "s2", 49),
        ],
    )

    import numpy as np

    rng = np.random.default_rng(5)
    emb = []
    for i in range(10):
        emb.append((i, [float(x) for x in rng.normal(size=64)], i % 3))
    emb += [
        (10, None, 0),
        (11, [NAN] * 64, 1),
        (12, [float("inf")] + [0.1] * 63, 2),
        (13, [0.0] * 64, 0),
    ]
    write("embeddings", emb)
    return out


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_torture_no_crash(name, spark, torture_dir):
    df = entrymod.queries()[name](spark, torture_dir)
    pdf = df.toPandas()
    assert pdf.shape[1] > 0


@pytest.fixture(scope="module")
def sparse_dir(spark, tmp_path_factory):
    """Near-empty dataset: every table holds 1-3 clean rows — below every
    min_count / n_centroids / grid default. Flushes out the driver-side
    `.collect()[0]` / `first() is None` crash class that clean full-size
    data never exercises."""
    out = str(tmp_path_factory.mktemp("sparse"))

    def schema_of(table):
        return spark.read.parquet(f"{REAL}/{table}.parquet").schema

    def _as_single_file(df, table):
        import glob
        import shutil

        tmp = f"{out}/_tmp_{table}"
        df.coalesce(1).write.parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.move(part, f"{out}/{table}.parquet")
        shutil.rmtree(tmp)

    def write(table, rows):
        _as_single_file(spark.createDataFrame(rows, schema_of(table)), table)

    for dim in ("region", "nation", "customer", "supplier", "part"):
        _as_single_file(spark.read.parquet(f"{REAL}/{dim}.parquet").limit(2), dim)

    import datetime as dt

    def t(s):
        return dt.datetime.fromisoformat(s)

    write("orders", [(1, 1, "O", 100.0, t("1996-01-05 00:00:00"), "1-URGENT")])
    write(
        "lineitem",
        [(1, 1, 1, 1, 5.0, 100.0, 0.05, 0.02, "N", "O", t("1996-01-10 00:00:00"))],
    )
    write(
        "events",
        [
            (1, t("2024-01-01 06:00:00"), 1, "A", 1.0, '{"k": 1}'),
            (2, t("2024-01-02 06:00:00"), 1, "A", 2.0, '{"k": 2}'),
            (3, t("2024-01-03 06:00:00"), 1, "A", 1.5, '{"k": 3}'),
        ],
    )
    write(
        "documents",
        [(0, "the quick brown fox jumps over the lazy dog", "en", "s0", 44)],
    )
    write(
        "embeddings",
        [
            (0, [1.0] * 32 + [0.0] * 32, 0),
            (1, [0.0] * 32 + [1.0] * 32, 1),
        ],
    )
    return out


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_sparse_no_incidental_crash(name, spark, sparse_dir):
    """Every query must either produce a (possibly empty) result or refuse
    the degenerate input with an EXPLICIT ValueError/RuntimeError carrying a
    message — never an incidental IndexError/TypeError/KeyError or a Spark
    stage abort."""
    try:
        pdf = entrymod.queries()[name](spark, sparse_dir).toPandas()
    except (ValueError, RuntimeError) as e:
        assert str(e), "explicit refusals must carry a message"
        return
    assert pdf.shape[1] > 0
