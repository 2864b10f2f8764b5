"""Tests the reference never wrote (its tests/test_timefrequency.py is
empty, SURVEY.md §5): analytic recovery checks for WPS/HHT + kernel units."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from periodicity_spark.timefrequency.kernels import (
    cwt_morlet,
    denoise_db4,
    hilbert_analytic,
)
from periodicity_spark.timefrequency.wps import composite_spectrum, gwps, sav, with_coi_mask, wps
from periodicity_spark.timefrequency.hht import hht, marginal_spectrum


def _sine_df(spark, n=512, period=16.0):
    t = np.arange(n, dtype=float)
    return spark.createDataFrame(
        pd.DataFrame(
            {"series_id": "s", "time": t, "value": np.sin(2 * np.pi * t / period)}
        )
    )


def test_hilbert_kernel():
    t = np.arange(256, dtype=float)
    x = np.cos(2 * np.pi * t / 16)
    a = hilbert_analytic(x)
    # analytic signal of cos has ~unit amplitude away from the edges
    assert np.allclose(np.abs(a)[16:-16], 1.0, atol=1e-2)


def test_cwt_peak_at_true_period():
    t = np.arange(512, dtype=float)
    x = np.sin(2 * np.pi * t / 16)
    periods = np.array([4.0, 8.0, 16.0, 32.0, 64.0])
    coefs = cwt_morlet(x, 1.0, periods)
    power = (np.abs(coefs) ** 2).mean(axis=1)
    assert periods[np.argmax(power / (periods))] == 16.0


def test_wps_gwps_best_period(spark):
    df = _sine_df(spark, n=512, period=16.0)
    periods = [4.0, 8.0, 12.0, 16.0, 24.0, 32.0, 64.0]
    tf = wps(df, periods)
    g = gwps(tf, masked=True).toPandas()
    best = g.loc[g["power"].idxmax()]
    assert 1.0 / best["frequency"] == pytest.approx(16.0)


def test_wps_sav_and_coi(spark):
    df = _sine_df(spark, n=256, period=16.0)
    tf = wps(df, [8.0, 16.0, 32.0])
    masked = with_coi_mask(tf).toPandas()
    # edges are outside the cone for every period
    assert not masked[masked["time"] == 0.0]["in_coi"].any()
    s = sav(tf, pmin=10.0, pmax=20.0).toPandas()
    assert len(s) == 256


def test_composite_spectrum(spark):
    df = _sine_df(spark, n=400, period=20.0)
    periods = [5.0, 10.0, 15.0, 20.0, 25.0, 40.0]
    cs = composite_spectrum(df, periods).toPandas()
    best = cs.loc[cs["power"].idxmax()]
    assert best["period"] == pytest.approx(20.0)


def test_hht_marginal_peak(spark):
    # two persistent tones → HHT marginal spectrum peaks at both frequencies
    t = np.arange(1000, dtype=float)
    x = np.sin(2 * np.pi * 0.25 * t) + np.sin(2 * np.pi * 0.03 * t)
    df = spark.createDataFrame(pd.DataFrame({"series_id": "s", "time": t, "value": x}))
    grid = list(np.linspace(0.0, 0.5, 26))
    tf = hht(df, grid, method="HT")
    m = marginal_spectrum(tf).toPandas().sort_values("power", ascending=False)
    top2 = sorted(m["frequency"].head(2).tolist())
    assert top2[0] == pytest.approx(0.03, abs=0.03)
    assert top2[1] == pytest.approx(0.25, abs=0.03)


def test_denoise_db4():
    rng = np.random.default_rng(42)
    t = np.arange(1024, dtype=float)
    clean = np.sin(2 * np.pi * t / 128)
    noisy = clean + 0.3 * rng.standard_normal(1024)
    den = denoise_db4(noisy, sigma=0.3)
    assert len(den) == 1024
    # denoising should reduce the error vs the clean signal
    assert np.linalg.norm(den - clean) < 0.7 * np.linalg.norm(noisy - clean)


def test_wavelet_filter_bank_qmf_identities():
    """Every WAVELET_FILTERS entry must be a legitimate orthogonal scaling
    filter: Σh = √2, unit energy, and even-shift self-orthogonality — a
    single transcribed digit breaks these at ~1e-10. db2/db3/db4 also pinned
    against closed-form Daubechies values where available."""
    import numpy as np

    from periodicity_spark.timefrequency.kernels import WAVELET_FILTERS

    # 1e-10: the published constants are rounded at ~16 digits, so the
    # identities hold to ~5e-12; a wrong digit shows up at >= 1e-8
    for name, h in WAVELET_FILTERS.items():
        assert np.sum(h) == pytest.approx(np.sqrt(2), abs=1e-10), name
        assert np.sum(h * h) == pytest.approx(1.0, abs=1e-10), name
        for m in range(1, len(h) // 2):
            assert np.dot(h[: -2 * m], h[2 * m :]) == pytest.approx(0.0, abs=1e-10), (
                name, m,
            )
    # db2 closed form: ((1±√3), (3±√3))/(4√2)
    s3, r2 = np.sqrt(3.0), np.sqrt(2.0)
    db2 = np.array([1 - s3, 3 - s3, 3 + s3, 1 + s3]) / (4 * r2)
    np.testing.assert_allclose(WAVELET_FILTERS["db2"], db2, atol=1e-15)


def test_denoise_dwt_families(spark):
    """Each family: σ=0 is perfect reconstruction; with noise, shrinkage in
    ANY family recovers a smooth signal better than no shrinkage; db4 path
    is bit-identical to the historical denoise_db4; unknown family raises
    at plan-build time."""
    import numpy as np

    from periodicity_spark.timefrequency.kernels import (
        WAVELET_FILTERS,
        denoise_db4,
        denoise_dwt,
    )

    rng = np.random.default_rng(4)
    n = 512
    t = np.arange(n, dtype=float)
    clean = np.sin(2 * np.pi * t / 64)
    noisy = clean + rng.normal(0, 0.3, n)
    noise = noisy - clean
    for name in WAVELET_FILTERS:
        np.testing.assert_allclose(
            denoise_dwt(noisy, 0.0, wavelet=name), noisy, atol=1e-9, err_msg=name
        )
        # the universal-threshold guarantee every family satisfies:
        # pure noise is crushed (>97% of its energy removed)
        z = denoise_dwt(noise, 0.3, wavelet=name)
        assert np.mean(z**2) < 0.05 * np.mean(noise**2), name
    # on a smooth signal the smooth families must beat the noisy input
    # (haar/db2 legitimately lose on smooth signals — their detail
    # coefficients carry real signal that the soft threshold shrinks)
    for name in ("db3", "db4", "sym4"):
        y = denoise_dwt(noisy, 0.3, wavelet=name)
        assert np.mean((y - clean) ** 2) < 0.85 * np.mean(noise**2), name
    np.testing.assert_array_equal(denoise_dwt(noisy, 0.3), denoise_db4(noisy, 0.3))
    with pytest.raises(ValueError, match="unknown wavelet"):
        denoise_dwt(noisy, 0.3, wavelet="nope")


def test_denoise_operator_wavelet_kwarg(spark):
    """denoise(wavelet='sym4') through the distributed operator equals the
    local kernel per series; a bad family raises before any job runs."""
    import numpy as np
    import pandas as pd

    from periodicity_spark.operators.clean import robust_noise_np
    from periodicity_spark.timefrequency.kernels import denoise_dwt
    from periodicity_spark.timefrequency.wps import denoise

    rng = np.random.default_rng(2)
    t = np.arange(256, dtype=float)
    v = np.sin(2 * np.pi * t / 32) + rng.normal(0, 0.2, 256)
    ts = spark.createDataFrame(
        pd.DataFrame({"series_id": "s", "time": t, "value": v})
    )
    got = denoise(ts, wavelet="sym4").orderBy("time").toPandas()["value"].to_numpy()
    want = denoise_dwt(v, robust_noise_np(v) or 0.0, wavelet="sym4")
    np.testing.assert_allclose(got, want, rtol=1e-12)
    with pytest.raises(ValueError, match="unknown wavelet"):
        denoise(ts, wavelet="bogus")
