"""Tests the reference never wrote (its tests/test_phase.py is empty):
differential vs literal NumPy transliterations of phase.py, plus analytic
sine recovery."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from periodicity_spark.phase.pdm import pdm_theta
from periodicity_spark.phase.stringlength import string_length


def _np_stringlength(t, x, period):
    # literal reference phase.py:45-51,66
    m = (x - x.max()) / (2 * (x.max() - x.min())) + 0.25
    phi = (t / period) % 1
    order = np.argsort(phi)
    phi, m = phi[order], m[order]
    return np.hypot(np.roll(m, -1) - m, np.roll(phi, -1) - phi).sum()


def _np_pdm(t, x, period, nb=5, nc=2):
    # literal reference phase.py:128-149
    m0 = nb * nc
    phi = (t / period) % 1
    order = np.argsort(phi)
    phi, m = phi[order], x[order]
    mj, good = [], 0
    for k in range(m0):
        mask = (phi >= k / m0) & (phi < (k + nc) / m0)
        mask |= phi < (k - (m0 - nc)) / m0
        mk = m[mask]
        if mk.size > 1:
            mj.append(mk)
            good += 1
    sj = np.array([np.var(k, ddof=1) for k in mj])
    nj = np.array([k.size for k in mj])
    ss = np.sum((nj - 1) * sj) / (np.sum(nj) - good)
    return ss / np.var(x, ddof=1)


@pytest.fixture(scope="module")
def noisy_sine():
    rng = np.random.default_rng(42)
    t = np.sort(rng.uniform(0, 100, 400))
    x = np.sin(2 * np.pi * t / 7.0) + 0.2 * rng.standard_normal(400)
    return t, x


def test_stringlength_matches_numpy(spark, noisy_sine):
    t, x = noisy_sine
    periods = [3.0, 5.0, 7.0, 11.0]
    ts = spark.createDataFrame(pd.DataFrame({"series_id": "s", "time": t, "value": x}))
    grid = spark.createDataFrame(pd.DataFrame({"period": periods}))
    got = {
        r["period"]: r["ell"]
        for r in string_length(ts, grid).collect()
    }
    for p in periods:
        assert got[p] == pytest.approx(_np_stringlength(t, x, p), rel=1e-9)
    # the true period has the smallest string length
    assert min(got, key=got.get) == 7.0


def test_pdm_matches_numpy(spark, noisy_sine):
    t, x = noisy_sine
    periods = [3.0, 5.0, 7.0, 11.0]
    ts = spark.createDataFrame(pd.DataFrame({"series_id": "s", "time": t, "value": x}))
    grid = spark.createDataFrame(pd.DataFrame({"period": periods}))
    got = {r["period"]: r["theta"] for r in pdm_theta(ts, grid).collect()}
    for p in periods:
        assert got[p] == pytest.approx(_np_pdm(t, x, p), rel=1e-9)
    # the true period minimizes theta
    assert min(got, key=got.get) == 7.0
