"""Regression guard for the driver contract: EVERY queries() entry runs at
sf0.001, and every oracle_sql() twin is value-checked against DuckDB — the
same comparison tools/selfcheck.py (and the driver) performs. The driver's
fixed manifest covers only a subset; this test covers the whole surface, so
an oracle drift anywhere fails `pytest tests/` locally.

Set SPARK_GRAFT_TEST_SF_DIR to re-run the same gate at another scale.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tools.selfcheck import TABLES, compare  # noqa: E402

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="module")
def ingest_ok(spark, sf_dir):
    """Fail ONCE, pointedly, if events ingestion itself is broken — without
    this, an ingest-level schema drift surfaces as dozens of identical
    parametrized failures (r4 post-mortem). Module-scoped: the error is
    cached, so the remaining tests report one-line setup errors."""
    from periodicity_spark.sources.ingest import ts_from_events

    try:
        ts_from_events(spark, sf_dir).limit(1).collect()
    except Exception as e:  # noqa: BLE001 — any ingest error is the headline
        pytest.fail(
            f"events ingestion broken at {sf_dir} — fix "
            f"periodicity_spark/sources/ingest.py before anything else: {e}",
            pytrace=False,
        )


def test_every_oracle_has_a_query():
    missing = sorted(set(ORACLES) - set(QUERIES))
    assert not missing, f"oracle_sql() without queries() entry: {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_contract_query(name, spark, sf_dir, duck, ingest_ok):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        # rows-only contract: the driver only asserts the query runs and
        # returns a stable shape; deeper checks live in the operator tests
        assert sdf.shape[1] > 0
        # gate convention: a rows-only query may publish boolean *_ok
        # columns (recall_ok, agree_ok, …) — those are its whole point,
        # so machine-assert them here rather than trusting eyeballs
        for col in sdf.columns:
            if col.endswith("_ok"):
                assert sdf[col].all(), f"{name}: gate column {col} is False"
        return
    ddf = duck.sql(ORACLES[name]).df()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems[:4])
