"""Celerite-style O(N) GP tests (reference gp.py:340-538, tests/test_gp.py:24-56).

The load-bearing check is the differential: the O(N·J²) semiseparable
factorization must agree with a dense Cholesky built from the same
exponential-mixture kernel to float precision, for both underdamped and
overdamped SHO regimes.
"""

import math
import time

import numpy as np
import pandas as pd
import pytest

from periodicity_spark.gp import celerite_map
from periodicity_spark.gp.celerite import (
    CeleriteCoeffs,
    brownian_coeffs,
    brownian_prior_transform,
    celerite_loocv,
    celerite_map_fit,
    celerite_nll,
    celerite_rss_logdet,
    celerite_solve,
    default_period_ppf,
    harmonic_prior_transform,
    norm_ppf,
    rotation_coeffs,
    sho_coeffs,
    sho_from_sigma_rho_tau,
)

LN2PI = math.log(2 * math.pi)


def dense_nll(t, y, diag, k, mean=0.0):
    tau = np.abs(t[:, None] - t[None, :])
    K = k.value(tau)
    K[np.diag_indices_from(K)] = k.variance + diag
    L = np.linalg.cholesky(K)
    r = y - mean
    alpha = np.linalg.solve(L, r)
    return 0.5 * (alpha @ alpha) + np.sum(np.log(np.diag(L))) + 0.5 * len(y) * LN2PI, K


KERNELS = {
    "underdamped": sho_coeffs(1.3, 2.0, 4.0),
    "overdamped": sho_coeffs(0.7, 0.5, 0.01),
    "brownian": brownian_coeffs(sigma=1.1, tau=30.0, period=9.0, mix=0.3),
    "rotation": rotation_coeffs(sigma=0.9, period=7.0, Q0=1.2, dQ=0.8, f=0.4),
}


@pytest.mark.parametrize("name", list(KERNELS))
def test_on_matches_dense(name):
    k = KERNELS[name]
    rng = np.random.default_rng(3)
    t = np.sort(rng.uniform(0, 50, 200))
    y = rng.standard_normal(200)
    diag = np.full(200, 0.04)
    fast = celerite_nll(t, y, diag, k, mean=0.1)
    dense, _ = dense_nll(t, y, diag, k, mean=0.1)
    assert fast == pytest.approx(dense, rel=1e-9)


def test_rss_logdet_components():
    k = KERNELS["brownian"]
    rng = np.random.default_rng(5)
    t = np.sort(rng.uniform(0, 40, 150))
    y = rng.standard_normal(150)
    diag = np.full(150, 0.09)
    rss, logdet = celerite_rss_logdet(t, y, diag, k)
    tau = np.abs(t[:, None] - t[None, :])
    K = k.value(tau)
    K[np.diag_indices_from(K)] = k.variance + diag
    assert logdet == pytest.approx(np.linalg.slogdet(K)[1], rel=1e-9)
    assert rss == pytest.approx(y @ np.linalg.solve(K, y), rel=1e-8)


def test_solve_roundtrip():
    k = KERNELS["rotation"]
    rng = np.random.default_rng(11)
    t = np.sort(rng.uniform(0, 25, 120))
    y = rng.standard_normal(120)
    diag = np.full(120, 0.01)
    x = celerite_solve(t, diag, k, y)
    tau = np.abs(t[:, None] - t[None, :])
    K = k.value(tau)
    K[np.diag_indices_from(K)] = k.variance + diag
    np.testing.assert_allclose(K @ x, y, atol=1e-8)


def test_variance_is_k0():
    for k in KERNELS.values():
        assert k.variance == pytest.approx(float(k.value(0.0)), rel=1e-12)
        assert k.variance > 0


def test_sho_sigma_rho_tau_variance():
    # celerite2 convention: sigma² is the kernel variance
    k = sho_from_sigma_rho_tau(sigma=1.7, rho=5.0, tau=40.0)
    assert k.variance == pytest.approx(1.7**2, rel=1e-12)


def test_brownian_variance_split():
    # BrownianTerm total variance ≈ sigma²: exactly mix·σ² from the periodic
    # SHO plus (1−mix)·σ²·2/(1+1/f) from the overdamped one, f=√(1−4Q²)
    # with Q=0.01 — the reference's own normalization is off by that ~1e-4
    # factor, reproduced faithfully here
    k = brownian_coeffs(sigma=2.0, tau=50.0, period=10.0, mix=0.4)
    f = math.sqrt(1 - 4 * 0.01**2)
    want = 4.0 * (0.4 + 0.6 * 2 / (1 + 1 / f))
    assert k.variance == pytest.approx(want, rel=1e-12)
    assert k.variance == pytest.approx(4.0, rel=1e-3)


def test_psd_positive_and_peaked():
    k = KERNELS["underdamped"]  # w0=2 → cyclic freq w0/2π
    f = np.linspace(0.01, 1.0, 400)
    s = k.psd(f)
    assert (s > 0).all()
    assert f[np.argmax(s)] == pytest.approx(2.0 / (2 * np.pi), rel=0.1)


def test_norm_ppf_accuracy():
    # round-trip vs erf-based CDF at a few quantiles
    for u, z in [(0.5, 0.0), (0.8413447460685429, 1.0), (0.02275013194817921, -2.0)]:
        assert norm_ppf(u) == pytest.approx(z, abs=2e-8)
    assert norm_ppf(0.975) == pytest.approx(1.959963985, abs=1e-7)


def test_prior_transform_median():
    ppf = default_period_ppf(12.0, 400)
    p = brownian_prior_transform(np.full(6, 50.0), 1.0, 0.5, 1e-4, ppf)
    assert p["mean"] == pytest.approx(1.0)
    assert p["period"] == pytest.approx(12.0, rel=1e-9)
    assert p["sigma"] == pytest.approx(0.5, rel=1e-9)
    assert p["mix"] == pytest.approx(0.25)
    assert p["tau"] == pytest.approx(12.0 * 10**0.5, rel=1e-9)
    h = harmonic_prior_transform(np.full(7, 50.0), 1.0, 0.5, 1e-4, ppf)
    assert h["Q0"] == pytest.approx(math.e, rel=1e-9)
    assert h["f"] == pytest.approx(0.5)


def test_loocv_matches_dense():
    k = KERNELS["underdamped"]
    rng = np.random.default_rng(21)
    t = np.sort(rng.uniform(0, 30, 80))
    y = rng.standard_normal(80)
    diag = np.full(80, 0.04)
    got = celerite_loocv(t, y, diag, k)
    tau = np.abs(t[:, None] - t[None, :])
    K = k.value(tau)
    K[np.diag_indices_from(K)] = k.variance + diag
    Kinv = np.linalg.inv(K)
    q = Kinv @ y
    c = np.diag(Kinv)
    want = -0.5 * (np.sum(q**2 / c) - np.sum(np.log(c)) + 80 * LN2PI)
    assert got == pytest.approx(want, rel=1e-7)


def test_map_fit_recovers_period():
    rng = np.random.default_rng(42)
    t = np.sort(rng.uniform(0, 120, 400))
    y = np.sin(2 * np.pi * t / 10.0) + 0.2 * rng.standard_normal(400)
    err = np.full(400, 0.2)
    params, nll = celerite_map_fit(t, y, err, kernel="brownian", init_period=11.0)
    assert params["period"] == pytest.approx(10.0, rel=0.15)
    assert np.isfinite(nll)
    # fitted NLL beats the prior-median start (sanity the optimizer moved)
    ppf = default_period_ppf(11.0, 400)
    p0 = brownian_prior_transform(
        np.full(6, 50.0), float(np.mean(y)), float(np.std(y)), float(np.min(err)) ** 2, ppf
    )
    from periodicity_spark.gp.celerite import params_to_coeffs

    k0 = params_to_coeffs("brownian", p0)
    assert nll <= celerite_nll(t, y, err**2 + p0["jitter"], k0, p0["mean"])


def test_long_series_scaling():
    # the O(N) point: a 100k-sample NLL evaluates in seconds and O(N·J) memory
    # (the dense kernel would be an 80 GB matrix)
    rng = np.random.default_rng(1)
    n = 100_000
    t = np.sort(rng.uniform(0, 5000, n))
    y = np.sin(2 * np.pi * t / 10) + 0.3 * rng.standard_normal(n)
    k = KERNELS["brownian"]
    t0 = time.time()
    nll = celerite_nll(t, y, np.full(n, 0.09), k)
    elapsed = time.time() - t0
    assert np.isfinite(nll)
    assert elapsed < 30.0


def test_celerite_map_spark(spark):
    rng = np.random.default_rng(42)
    t = np.sort(rng.uniform(0, 120, 300))
    y = np.sin(2 * np.pi * t / 10.0) + 0.2 * rng.standard_normal(300)
    ts = spark.createDataFrame(pd.DataFrame({"series_id": "c", "time": t, "value": y}))
    row = celerite_map(ts).collect()[0]
    assert row["period_map"] == pytest.approx(10.0, rel=0.2)
    assert np.isfinite(row["nll"]) and row["sigma"] > 0 and row["jitter"] > 0
