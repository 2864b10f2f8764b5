"""GP layer tests (numpy GP stands in for george/celerite2 — reference
tests/test_gp.py pins exact library-specific values; ours assert period
recovery, the invariant those values encode)."""

import numpy as np
import pandas as pd
import pytest

from periodicity_spark.gp import (
    gaussian_prior_density,
    gp_map,
    gp_mcmc_period,
    make_gaussian_prior_mixture,
)


@pytest.fixture(scope="module")
def qp_signal(spark):
    rng = np.random.default_rng(42)
    t = np.sort(rng.uniform(0, 120, 160))
    # quasi-periodic: period 10, slow amplitude drift, white noise
    y = (1.0 + 0.2 * np.sin(2 * np.pi * t / 80)) * np.sin(2 * np.pi * t / 10.0)
    y += 0.15 * rng.standard_normal(len(t))
    return spark.createDataFrame(
        pd.DataFrame({"series_id": "qp", "time": t, "value": y})
    )


def test_gp_map_recovers_period(spark, qp_signal):
    row = gp_map(qp_signal).collect()[0]
    assert row["period_map"] == pytest.approx(10.0, rel=0.25)


def test_gp_mcmc_period(spark, qp_signal):
    row = gp_mcmc_period(qp_signal, n_walkers=12, n_steps=120, burn=40, seed=42).collect()[0]
    assert row["period_median"] == pytest.approx(10.0, rel=0.3)
    assert row["period_p16"] <= row["period_median"] <= row["period_p84"]


def test_gaussian_prior_mixture(spark):
    rng = np.random.default_rng(7)
    t = np.arange(3000, dtype=float)
    y = np.sin(2 * np.pi * t / 60.0) + 0.3 * rng.standard_normal(3000)
    ts = spark.createDataFrame(pd.DataFrame({"series_id": "s", "time": t, "value": y}))
    mix = make_gaussian_prior_mixture(ts, p_min=20.0, periods=[80.0, 160.0, 320.0])
    comp = mix.toPandas()
    assert (comp["weight"] >= 0).all()
    grid = list(np.linspace(np.log(20), np.log(300), 60))
    dens = gaussian_prior_density(mix, grid).toPandas()
    best = dens.loc[dens["density"].idxmax()]
    # prior peaks at the true 60-sample period (log 60 ≈ 4.09)
    assert np.exp(best["log_p"]) == pytest.approx(60.0, rel=0.15)


def test_celerite_map_loocv_column(spark):
    """loocv=True appends the log-LOO-CV score (finite, and bounded above by
    ~the model's mean log-density); schema without the flag is unchanged."""
    import pandas as pd

    rng = np.random.default_rng(11)
    t = np.sort(rng.uniform(0, 30, 150))
    y = np.sin(2 * np.pi * t / 5.0) + 0.1 * rng.standard_normal(len(t))
    ts = spark.createDataFrame(
        pd.DataFrame({"series_id": "s", "time": t, "value": y})
    )
    from periodicity_spark.gp import celerite_map

    base = celerite_map(ts, kernel="brownian", init=None, max_iter=60)
    assert "loocv" not in base.columns
    row = (
        celerite_map(ts, kernel="brownian", init=None, max_iter=60, loocv=True)
        .collect()[0]
    )
    assert np.isfinite(row["loocv"])
    # LOO predictive log-density can't beat the joint fit per point by much;
    # sanity-bound it to the same order as -nll
    assert row["loocv"] < 0 or abs(row["loocv"]) < abs(row["nll"]) * 10
