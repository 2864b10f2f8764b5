"""Ports of reference tests/test_core.py invariants + operator unit tests."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from periodicity_spark.functions.stats import series_stats
from periodicity_spark.operators import agg, clean, resample, transform, windows
from periodicity_spark.operators.acf import acf_fft, acf_lag_grid
from periodicity_spark.sources.synthetic import gappy_sine, sine


def _ts(spark, t, v, sid="s"):
    return spark.createDataFrame(
        pd.DataFrame({"series_id": sid, "time": np.asarray(t, float), "value": np.asarray(v, float)})
    )


def test_stats_median_dt_and_uniformity(spark):
    # reference tests/test_core.py:18-23 — median_dt of [1,3,4] is 1.5, non-uniform
    st = series_stats(_ts(spark, [1, 3, 4], [1, 1, 1])).collect()[0]
    assert st["median_dt"] == 1.5
    assert not st["is_uniform"]
    assert st["dt"] is None
    # reference tests/test_core.py:25-26 — baseline of arange(10) is 9
    st2 = series_stats(_ts(spark, np.arange(10), np.ones(10))).collect()[0]
    assert st2["baseline"] == 9
    assert st2["is_uniform"] and st2["dt"] == 1.0
    # reference tests/test_core.py:29-34 — slicing breaks uniformity
    st3 = series_stats(_ts(spark, [2, 5, 6], np.ones(3))).collect()[0]
    assert not st3["is_uniform"]


def test_teo_of_sine_wave(spark):
    # reference tests/test_core.py:51-55 (smaller N for test speed; the
    # identity TEO(sin(t)) ≈ dt-independent holds on any dense grid)
    t = np.linspace(0, 100, 10001)
    df = _ts(spark, t, np.sin(t))
    teo = windows.teo(df).orderBy("time").toPandas()["value"].to_numpy()
    assert np.allclose(teo[:-2], 1.0, atol=1e-4)


def test_fold(spark):
    df = _ts(spark, np.arange(10, dtype=float), np.ones(10))
    out = transform.fold(df, 3.0).orderBy("value").toPandas()
    assert np.allclose(sorted(out["time"]), sorted((np.arange(10) / 3.0) % 1))


def test_downsample_matches_reference(spark):
    # differential vs reference semantics: labels=arange(tmin,tmax,dt),
    # pandas.cut right-closed equal-width bins, label=left arange value
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 20, 200))
    v = rng.standard_normal(200)
    out = (
        resample.downsample(_ts(spark, t, v), 2.5)
        .orderBy("time")
        .toPandas()
    )
    labels = np.arange(t.min(), t.max(), 2.5)
    cats = pd.cut(t, bins=labels.size, labels=labels)
    expected = pd.Series(v).groupby(cats, observed=True).mean()
    assert np.allclose(out["time"].to_numpy(), expected.index.to_numpy(float))
    assert np.allclose(out["value"].to_numpy(), expected.to_numpy())


def test_split_segments(spark):
    df = gappy_sine(spark)
    seg = windows.split(df, max_gap=1.5)
    counts = seg.groupBy("segment").count().orderBy("segment").collect()
    assert len(counts) == 3  # two removed spans → three segments


def test_interpolate_na_linear_ffill(spark):
    t = np.arange(8, dtype=float)
    v = [1.0, None, None, 4.0, 5.0, None, 7.0, None]
    pdf = pd.DataFrame({"series_id": "s", "time": t, "value": v})
    df = spark.createDataFrame(pdf)
    lin = clean.interpolate_na(df, "linear").orderBy("time").toPandas()["value"].tolist()
    assert lin[:7] == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0]
    assert lin[7] is None or np.isnan(lin[7])  # trailing NULL stays
    ff = clean.interpolate_na(df, "ffill").orderBy("time").toPandas()["value"].tolist()
    assert ff == [1.0, 1.0, 1.0, 4.0, 5.0, 5.0, 7.0, 7.0]


def test_fill_gaps_count_matches_reference_walk(spark):
    # gap of 40 with dt=1 → reference while-loop inserts 39 points
    df = _ts(spark, [0.0, 1.0, 2.0, 42.0, 43.0], np.ones(5))
    out = resample.fill_gaps(df, dt=1.0)
    assert out.count() == 5 + 39


def test_convolve_matches_numpy(spark):
    rng = np.random.default_rng(1)
    v = rng.standard_normal(50)
    kern = [0.25, 0.5, 0.25]
    out = (
        clean.convolve(_ts(spark, np.arange(50), v), kern)
        .orderBy("time")
        .toPandas()["value"]
        .to_numpy()
    )
    padded = np.concatenate([v[1:2][::-1], v, v[-2:-1][::-1]])
    expected = np.convolve(padded, kern, mode="valid")
    assert np.allclose(out, expected)


def test_boxcar_smooth_matches_numpy(spark):
    rng = np.random.default_rng(2)
    v = rng.standard_normal(40)
    out = (
        clean.smooth(_ts(spark, np.arange(40), v), 3, kernel="boxcar")
        .orderBy("time")
        .toPandas()["value"]
        .to_numpy()
    )
    padded = np.concatenate([v[1:2][::-1], v, v[-2:-1][::-1]])
    expected = np.convolve(padded, np.ones(3) / 3, mode="valid")
    assert np.allclose(out, expected)


def test_acf_lag_grid_matches_numpy(spark):
    rng = np.random.default_rng(3)
    v = rng.standard_normal(100)
    out = (
        acf_lag_grid(_ts(spark, np.arange(100), v), max_lag=10)
        .orderBy("lag")
        .toPandas()["acf"]
        .to_numpy()
    )
    yc = v - v.mean()
    expected = np.array([np.dot(yc[: 100 - k], yc[k:]) for k in range(10)])
    expected /= expected[0]
    assert np.allclose(out, expected)


def test_acf_fft_matches_reference_algorithm(spark):
    rng = np.random.default_rng(4)
    v = rng.standard_normal(64)
    t = np.arange(64, dtype=float)
    out = acf_fft(_ts(spark, t, v), max_lag=16).orderBy("lag").toPandas()
    # literal reference algorithm (core.py:603-607)
    nfft = 128
    psd = np.abs(np.fft.rfft(v - v.mean(), n=nfft)) ** 2
    ryy = np.fft.irfft(psd)[:16]
    ryy /= ryy[0]
    assert np.allclose(out["acf"].to_numpy(), ryy)


def test_peaks_and_prominence(spark):
    t = np.arange(9, dtype=float)
    v = np.array([0, 2, 0, 3, 1, 5, 0, 1, 0], dtype=float)
    peaks = (
        windows.find_peaks(_ts(spark, t, v)).orderBy("time").toPandas()
    )
    assert peaks["time"].tolist() == [1.0, 3.0, 5.0, 7.0]
    proms = (
        windows.find_peaks_prominence(_ts(spark, t, v))
        .orderBy("time")
        .toPandas()
    )
    # scipy.signal.peak_prominences reference values
    assert proms["prominence"].tolist() == [2.0, 2.0, 5.0, 1.0]


def test_roll(spark):
    df = _ts(spark, np.arange(5), [1.0, 2.0, 3.0, 4.0, 5.0])
    out = transform.roll(df, 2).orderBy("time").toPandas()["value"].tolist()
    assert out == [4.0, 5.0, 1.0, 2.0, 3.0]


def test_cov_corr_polyfit(spark):
    rng = np.random.default_rng(5)
    t = np.arange(50, dtype=float)
    y = 2.0 * t + 1.0 + 0.1 * rng.standard_normal(50)
    a = _ts(spark, t, y)
    fit = agg.polyfit_linear(a).collect()[0]
    np_fit = np.polyfit(t, y, 1)
    assert fit["slope"] == pytest.approx(np_fit[0], rel=1e-9)
    assert fit["intercept"] == pytest.approx(np_fit[1], rel=1e-9)
    b = _ts(spark, t, np.sin(t))
    cc = agg.cov_corr(a, b).collect()[0]
    assert cc["corr"] == pytest.approx(np.corrcoef(y, np.sin(t))[0, 1], rel=1e-9)


def test_estimate_noise(spark):
    rng = np.random.default_rng(6)
    t = np.arange(2000, dtype=float)
    v = np.sin(2 * np.pi * t / 500) + 0.25 * rng.standard_normal(2000)
    noise = clean.estimate_noise(_ts(spark, t, v)).collect()[0]["noise"]
    assert noise == pytest.approx(0.25, rel=0.15)


def test_interp_linear_matches_numpy(spark):
    rng = np.random.default_rng(7)
    t = np.sort(rng.uniform(0, 10, 30))
    v = rng.standard_normal(30)
    newt = np.linspace(-1, 11, 25)
    grid = spark.createDataFrame(pd.DataFrame({"time": newt}))
    out = (
        resample.interp_linear(_ts(spark, t, v), grid)
        .orderBy("time")
        .toPandas()["value"]
        .to_numpy()
    )
    assert np.allclose(out, np.interp(newt, t, v))


def test_get_constant_envelope(spark):
    # reference tests/test_core.py:37-48: envelope of sin(t) on
    # linspace(0,100,1001) within 2e-3 of ±1; pad-width insensitivity
    t = np.linspace(0, 100, 1001)
    df = _ts(spark, t, np.sin(t))
    e2 = windows.get_envelope(df, pad_width=2).orderBy("time").toPandas()
    assert np.abs(e2["upper"].to_numpy() - 1).max() < 2e-3
    assert np.abs(e2["lower"].to_numpy() + 1).max() < 2e-3
    e10 = windows.get_envelope(df, pad_width=10).orderBy("time").toPandas()
    assert np.allclose(e2["upper"].to_numpy(), e10["upper"].to_numpy())
    assert np.allclose(e2["lower"].to_numpy(), e10["lower"].to_numpy())
