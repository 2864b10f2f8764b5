"""Ports of reference tests/test_core.py invariants + operator unit tests."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from periodicity_spark.functions.stats import series_stats
from periodicity_spark.operators import agg, clean, resample, transform, windows
from periodicity_spark.operators.acf import acf_fft, acf_lag_grid
from periodicity_spark.sources.synthetic import (
    bpsk,
    gappy_sine,
    gaussian_atoms_plus_fm_sinusoid,
    sine,
)


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


def test_estimate_noise_local_differential(spark, sf_dir):
    """The one-pass Arrow kernel must agree with the distributed driver-loop
    version on the real events series — including null handling (null
    neighbors coalesce to the center value) and constant-series dropout."""
    from periodicity_spark.sources.ingest import ts_from_events

    ts = ts_from_events(spark, sf_dir)
    dist = {r.series_id: r.noise for r in clean.estimate_noise(ts).collect()}
    loc = {r.series_id: r.noise for r in clean.estimate_noise_local(ts).collect()}
    assert set(dist) == set(loc)
    for sid, n in dist.items():
        assert loc[sid] == pytest.approx(n, rel=1e-9, abs=1e-12), sid
    # constant series drops out of BOTH (empty kept set after first clip)
    const = _ts(spark, np.arange(40, dtype=float), np.full(40, 7.0))
    assert clean.estimate_noise(const).count() == 0
    assert clean.estimate_noise_local(const).count() == 0


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


def test_interp_nearest_and_zero(spark):
    t = np.array([0.0, 1.0, 3.0, 6.0])
    v = np.array([10.0, 20.0, 30.0, 40.0])
    newt = np.array([-0.5, 0.4, 2.0, 2.1, 4.0, 7.0])
    grid = spark.createDataFrame(pd.DataFrame({"time": newt}))
    near = (
        resample.interp(_ts(spark, t, v), grid, "nearest")
        .orderBy("time").toPandas()["value"].tolist()
    )
    # -0.5 clamps to first; 2.0 is equidistant (1,3) → earlier sample;
    # 4.0 nearer to 3 than 6; 7.0 clamps to last
    assert near == [10.0, 10.0, 20.0, 30.0, 30.0, 40.0]
    zero = (
        resample.interp(_ts(spark, t, v), grid, "zero")
        .orderBy("time").toPandas()["value"].tolist()
    )
    assert zero == [10.0, 10.0, 20.0, 20.0, 30.0, 40.0]


def test_interp_spline_matches_numpy_kernel(spark):
    from periodicity_spark.decomposition.kernels import cubic_spline

    rng = np.random.default_rng(11)
    t = np.sort(rng.uniform(0, 10, 25))
    v = np.sin(t) + 0.1 * rng.standard_normal(25)
    newt = np.linspace(0.2, 9.8, 40)
    grid = spark.createDataFrame(pd.DataFrame({"time": newt}))
    out = (
        resample.interp(_ts(spark, t, v), grid, "spline")
        .orderBy("time").toPandas()["value"].to_numpy()
    )
    np.testing.assert_allclose(out, cubic_spline(t, v, newt), rtol=1e-12)
    # smooth-function sanity: spline beats linear on sin
    dense_t = np.sort(rng.uniform(0, 10, 15))
    dv = np.sin(dense_t)
    sp = (
        resample.interp(_ts(spark, dense_t, dv), grid, "spline")
        .orderBy("time").toPandas()["value"].to_numpy()
    )
    li = (
        resample.interp(_ts(spark, dense_t, dv), grid, "linear")
        .orderBy("time").toPandas()["value"].to_numpy()
    )
    inside = (newt > dense_t.min()) & (newt < dense_t.max())
    err_sp = np.abs(sp - np.sin(newt))[inside].max()
    err_li = np.abs(li - np.sin(newt))[inside].max()
    assert err_sp < err_li


def test_cubic_spline_banded_equals_dense(spark):
    """The O(N) banded not-a-knot solve must reproduce the original dense
    np.linalg.solve formulation (which broke down at 10k+-sample series)."""
    from periodicity_spark.decomposition.kernels import cubic_spline

    rng = np.random.default_rng(0)
    for n in [4, 5, 17, 300]:
        t = np.sort(rng.uniform(0, 10, n)) + np.arange(n) * 1e-6
        v = rng.standard_normal(n)
        h = np.diff(t)
        A = np.zeros((n, n))
        rhs = np.zeros(n)
        for i in range(1, n - 1):
            A[i, i - 1] = h[i - 1]
            A[i, i] = 2 * (h[i - 1] + h[i])
            A[i, i + 1] = h[i]
            rhs[i] = 6 * ((v[i + 1] - v[i]) / h[i] - (v[i] - v[i - 1]) / h[i - 1])
        A[0, 0], A[0, 1], A[0, 2] = -h[1], h[0] + h[1], -h[0]
        A[n - 1, n - 3], A[n - 1, n - 2], A[n - 1, n - 1] = -h[-1], h[-2] + h[-1], -h[-2]
        M = np.linalg.solve(A, rhs)
        x = np.linspace(-1, 11, 101)
        idx = np.clip(np.searchsorted(t, x) - 1, 0, n - 2)
        x0, x1 = t[idx], t[idx + 1]
        hi = x1 - x0
        a, b = (x1 - x) / hi, (x - x0) / hi
        dense = (
            a * v[idx] + b * v[idx + 1]
            + ((a**3 - a) * M[idx] + (b**3 - b) * M[idx + 1]) * hi * hi / 6.0
        )
        np.testing.assert_allclose(cubic_spline(t, v, x), dense, atol=1e-9)


def test_smoothing_spline_kernel_contract(spark):
    """Reinsch smoothing spline: banded solve equals the dense QP solution
    at fixed λ; the s-targeted fit hits Σresid² = s; s=0 interpolates;
    s beyond the line RSS returns the least-squares line."""
    from periodicity_spark.decomposition.kernels import (
        _smoothing_fit,
        smoothing_spline,
    )

    rng = np.random.default_rng(5)
    for n in [4, 6, 40, 200]:
        t = np.sort(rng.uniform(0, 10, n)) + np.arange(n) * 1e-6
        v = rng.standard_normal(n)
        h = np.diff(t)
        Q = np.zeros((n, n - 2))
        R = np.zeros((n - 2, n - 2))
        for j in range(1, n - 1):
            Q[j - 1, j - 1] = 1 / h[j - 1]
            Q[j, j - 1] = -(1 / h[j - 1] + 1 / h[j])
            Q[j + 1, j - 1] = 1 / h[j]
            R[j - 1, j - 1] = (h[j - 1] + h[j]) / 3
            if j < n - 2:
                R[j - 1, j] = R[j, j - 1] = h[j] / 6
        for lam in [1e-6, 1e-2, 1.0, 100.0]:
            gam = np.linalg.solve(R + lam * Q.T @ Q, Q.T @ v)
            u_dense = v - lam * Q @ gam
            # rtol 1e-5: at λ=100 with dense spacing the system's
            # conditioning is ~1e10, so banded-vs-dense round-off
            # legitimately reaches ~1e-7 relative
            u, _, rss = _smoothing_fit(t, v, lam)
            np.testing.assert_allclose(u, u_dense, rtol=1e-5, atol=1e-6)
            assert rss == pytest.approx(float(np.sum((u_dense - v) ** 2)), rel=1e-4, abs=1e-6)
    t = np.linspace(0, 10, 200)
    v = np.sin(t) + rng.normal(0, 0.3, 200)
    for s in [0.5, 5.0, 17.0]:
        fit = smoothing_spline(t, v, t, s)
        assert float(np.sum((fit - v) ** 2)) == pytest.approx(s, rel=1e-6)
    np.testing.assert_allclose(smoothing_spline(t, v, t, 0.0), v, atol=1e-9)
    A = np.vstack([np.ones(200), t]).T
    coef, *_ = np.linalg.lstsq(A, v, rcond=None)
    np.testing.assert_allclose(smoothing_spline(t, v, t, 1e9), A @ coef, atol=1e-9)
    # the point of smoothing: recovers the clean signal better than interp
    sm = smoothing_spline(t, v, t, 200 * 0.09)
    assert np.mean((sm - np.sin(t)) ** 2) < 0.25 * np.mean((v - np.sin(t)) ** 2)


def test_quadratic_spline_kernel_contract(spark):
    """Midpoint-knot k=2 B-spline: interpolates the data exactly and
    reproduces any quadratic polynomial (k=2 polynomial-reproduction
    property) to machine precision."""
    from periodicity_spark.decomposition.kernels import quadratic_spline

    rng = np.random.default_rng(6)
    for n in [3, 4, 10, 100]:
        t = np.sort(rng.uniform(0, 10, n)) + np.arange(n) * 1e-5
        v = rng.standard_normal(n)
        np.testing.assert_allclose(quadratic_spline(t, v, t), v, atol=1e-8)
    t = np.linspace(0, 5, 30)
    v = 2 * t**2 - 3 * t + 1
    x = np.linspace(0, 5, 301)
    np.testing.assert_allclose(quadratic_spline(t, v, x), 2 * x**2 - 3 * x + 1, atol=1e-8)
    # probes outside the sample range are NaN (reference: xarray/interp1d
    # kind='quadratic' NaN-fills outside), not boundary-clamped
    oob = quadratic_spline(t, v, np.array([-1.0, 0.0, 5.0, 6.0]))
    assert np.isnan(oob[0]) and np.isnan(oob[3])
    np.testing.assert_allclose(oob[1:3], [1.0, 2 * 25 - 15 + 1], atol=1e-8)


def test_interp_smoothing_and_quadratic_distributed(spark):
    """interp(method='spline', s=...) and interp(method='quadratic') through
    the Arrow operator must equal the local kernels per series; unknown
    kwargs on non-spline methods raise."""
    from periodicity_spark.decomposition.kernels import (
        quadratic_spline,
        smoothing_spline,
    )

    rng = np.random.default_rng(9)
    t = np.sort(rng.uniform(0, 10, 60))
    v = np.sin(t) + 0.2 * rng.standard_normal(60)
    newt = np.linspace(0.2, 9.8, 37)
    grid = spark.createDataFrame(pd.DataFrame({"time": newt}))
    sm = (
        resample.interp(_ts(spark, t, v), grid, "spline", s=2.5)
        .orderBy("time").toPandas()["value"].to_numpy()
    )
    np.testing.assert_allclose(sm, smoothing_spline(t, v, newt, 2.5), rtol=1e-10)
    qd = (
        resample.interp(_ts(spark, t, v), grid, "quadratic")
        .orderBy("time").toPandas()["value"].to_numpy()
    )
    np.testing.assert_allclose(qd, quadratic_spline(t, v, newt), rtol=1e-10)
    with pytest.raises(TypeError):
        resample.interp(_ts(spark, t, v), grid, "linear", s=1.0)


def test_hht_tutorial_preprocessing_chain(spark):
    """Reference hht tutorial chain: gappy signal → interp(method='spline')
    onto a uniform grid → HHT marginal spectrum peaks at the tone."""
    from periodicity_spark.timefrequency.hht import hht, marginal_spectrum

    rng = np.random.default_rng(3)
    t = np.sort(rng.choice(np.arange(600.0), 480, replace=False))
    x = np.sin(2 * np.pi * 0.05 * t)
    uniform = np.arange(t.min(), t.max(), 1.0)
    grid = spark.createDataFrame(pd.DataFrame({"time": uniform}))
    ts_u = resample.interp(_ts(spark, t, x), grid, "spline")
    tf = hht(ts_u, list(np.linspace(0.0, 0.15, 16)))
    m = marginal_spectrum(tf).toPandas()
    best = m.loc[m["power"].idxmax()]
    assert best["frequency"] == pytest.approx(0.05, abs=0.02)


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


def test_bpsk_generator(spark):
    # reference doctest shape: t_bit·n_bits samples (data/__init__.py:88-90)
    y = bpsk(spark, t_bit=10, n_bits=400, f_c=0.05).orderBy("time").toPandas()
    assert len(y) == 4000
    assert set(y.columns) == {"series_id", "time", "re", "im"}
    z = y["re"].to_numpy() + 1j * y["im"].to_numpy()
    # noiseless: unit modulus, carrier peak at f_c in the spectrum
    assert np.allclose(np.abs(z), 1.0)
    # suppressed-carrier spectrum: the sinc² main lobe (width 1/t_bit) around
    # f_c carries most of the energy even though no discrete line exists
    spec = np.abs(np.fft.fft(z)) ** 2
    freqs = np.fft.fftfreq(len(z))
    inband = np.abs(freqs - 0.05) < 0.1
    assert spec[inband].sum() > 0.8 * spec.sum()
    # symbols are bit-held: constant over each 10-sample bit
    sym = np.sign((z * np.exp(-2j * np.pi * 0.05 * np.arange(4000))).real)
    assert (sym.reshape(400, 10) == sym.reshape(400, 10)[:, :1]).all()
    assert set(np.unique(sym)) == {-1.0, 1.0}
    # noisy variant: SNR scaling honors N0 (empirical complex variance)
    yn = bpsk(spark, t_bit=10, n_bits=400, f_c=0.05, n0_db=-10.0).orderBy("time").toPandas()
    zn = yn["re"].to_numpy() + 1j * yn["im"].to_numpy()
    noise = zn - z
    assert np.var(noise) == pytest.approx(0.1, rel=0.05)


def test_gaussian_atoms_plus_fm_sinusoid(spark):
    # reference doctest shape 2000 (data/__init__.py:135-138); exact NumPy
    # differential of the three components
    y = gaussian_atoms_plus_fm_sinusoid(spark).orderBy("time").toPandas()
    assert len(y) == 2000
    n = np.arange(1, 2001)
    fmax, fmin = 3 / 32, 9 / 128
    phi = -np.arccos((3 * fmin - fmax) / (fmax + fmin))
    x1 = 3 * np.exp(-(((n - 500) / 100) ** 2)) * np.cos(2 * np.pi * 5 / 16 * (n - 1000))
    x2 = np.cos(
        2 * np.pi * (fmax + fmin) / 2 * (n - 1000)
        + (fmax - fmin) / 2 * 1000 * (np.sin(2 * np.pi * n / 1000) + phi - np.sin(phi))
    )
    x3 = np.exp(-(((n - 1000) / 200) ** 2)) * np.cos(2 * np.pi * 7 / 256 * (n - 1000))
    np.testing.assert_allclose(y["value"].to_numpy(), x1 + x2 + x3, atol=1e-9)


def test_quantiles_match_numpy_linear_interpolation(spark):
    rng = np.random.default_rng(11)
    rows = []
    for sid, n in [("a", 101), ("b", 10), ("c", 1)]:
        for v in rng.standard_normal(n):
            rows.append((sid, float(v)))
    ts = spark.createDataFrame(
        pd.DataFrame(rows, columns=["series_id", "value"]).assign(
            time=lambda d: np.arange(len(d), dtype=float)
        )[["series_id", "time", "value"]]
    )
    got = agg.quantiles(ts).toPandas().set_index("series_id")
    pdf = pd.DataFrame(rows, columns=["series_id", "value"])
    for sid, g in pdf.groupby("series_id"):
        for p, col in [(25, "p25"), (50, "p50"), (75, "p75")]:
            want = np.percentile(g["value"].to_numpy(), p)  # linear interp
            assert got.loc[sid, col] == pytest.approx(want, abs=1e-12), (sid, col)
    assert int(got.loc["c", "n"]) == 1


def test_roll_time_trailing_window_hand_values(spark):
    ts = spark.createDataFrame(
        pd.DataFrame(
            {
                "series_id": ["s"] * 4,
                "time": [0.0, 0.5, 1.0, 3.0],
                "value": [1.0, 2.0, 3.0, 4.0],
            }
        )
    )
    out = (
        windows.roll_time(ts, width=1.0)
        .toPandas()
        .sort_values("time", ignore_index=True)
    )
    # trailing (t-1, t] windows: {1}, {1,2}, {1,2,3}, {4}
    assert out["roll_n"].tolist() == [1, 2, 3, 1]
    assert out["roll_mean"].tolist() == pytest.approx([1.0, 1.5, 2.0, 4.0])
    assert out["roll_max"].tolist() == pytest.approx([1.0, 2.0, 3.0, 4.0])


def test_ewma_matches_pandas_times_semantics(spark):
    rng = np.random.default_rng(23)
    t = np.sort(rng.uniform(0, 20, 80))
    v = rng.normal(50, 10, 80)
    ts = spark.createDataFrame(
        pd.DataFrame({"series_id": "s", "time": t, "value": v})
    )
    got = (
        clean.ewma(ts, halflife=2.0)
        .toPandas()
        .sort_values("time", ignore_index=True)["ewma"]
        .to_numpy()
    )
    want = (
        pd.Series(v)
        .ewm(
            halflife=pd.Timedelta(days=2),
            times=pd.to_datetime("2024-01-01") + pd.to_timedelta(t, unit="D"),
        )
        .mean()
        .to_numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_fold_profile_recovers_planted_shape(spark):
    """Folding a pure sinusoid at its true period: bin means trace the
    sinusoid (max bin near phase 0.25, min near 0.75); NULLs are skipped;
    bin count and edges are exact."""
    import math

    rows = []
    for i in range(400):
        t = i * 0.013
        rows.append(("s", t, math.sin(2 * math.pi * t / 2.5)))
    rows.append(("s", 0.5, None))  # skipped, not counted
    df = spark.createDataFrame(rows, "series_id string, time double, value double")
    from periodicity_spark.operators.transform import fold_profile

    out = fold_profile(df, period=2.5, nbins=8).toPandas().sort_values("bin")
    assert out["bin"].tolist() == list(range(8))
    assert out["n"].sum() == 400  # the NULL row is not counted
    means = out.set_index("bin")["mean_value"]
    assert means.idxmax() in (1, 2) and means.idxmin() in (5, 6)
    centers = out.set_index("bin")["phase_center"]
    assert abs(centers[0] - 1 / 16) < 1e-12 and abs(centers[7] - 15 / 16) < 1e-12
