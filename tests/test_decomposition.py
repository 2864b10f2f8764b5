"""Port of reference tests/test_decomposition.py thresholds + EMD/LMD units."""

import numpy as np
import pandas as pd
import pytest

from periodicity_spark.decomposition.ceemdan import CEEMDAN
from periodicity_spark.decomposition.emd import emd_modes, lmd_modes, orthogonality_matrix
from periodicity_spark.decomposition.kernels import emd
from periodicity_spark.sources.synthetic import sustained_plus_gapped_pure_tones


def test_emd_kernel_pure_and_two_tone():
    t = np.arange(1000, dtype=float)
    x = np.sin(2 * np.pi * 0.065 * t)
    modes, _ = emd(t, x)
    assert len(modes) == 1
    assert np.linalg.norm(modes[0] - x) / np.linalg.norm(x) < 1e-6
    x2 = np.sin(2 * np.pi * 0.25 * t) + np.sin(2 * np.pi * 0.03 * t)
    m2, _ = emd(t, x2)
    assert len(m2) == 2
    hi = np.sin(2 * np.pi * 0.25 * t)
    assert np.linalg.norm((m2[0] - hi)[5:-5]) / np.linalg.norm(hi[5:-5]) < 0.01


def test_emd_modes_spark(spark):
    t = np.arange(500, dtype=float)
    x = np.sin(2 * np.pi * 0.25 * t) + np.sin(2 * np.pi * 0.03 * t)
    df = spark.createDataFrame(pd.DataFrame({"series_id": "s", "time": t, "value": x}))
    out = emd_modes(df).toPandas()
    assert sorted(out["mode"].unique()) == [0, 1]
    orth = orthogonality_matrix(
        emd_modes(df).withColumnRenamed("value", "value")
    ).toPandas()
    offdiag = orth[(orth["mode_i"] == 0) & (orth["mode_j"] == 1)]["corr"].iloc[0]
    assert abs(offdiag) < 0.1  # well-separated tones → nearly orthogonal IMFs


def test_lmd_modes_spark(spark):
    t = np.arange(600, dtype=float)
    # AM-modulated carrier: LMD's home turf
    x = (1.0 + 0.5 * np.sin(2 * np.pi * 0.005 * t)) * np.sin(2 * np.pi * 0.1 * t)
    df = spark.createDataFrame(pd.DataFrame({"series_id": "s", "time": t, "value": x}))
    out = lmd_modes(df, max_modes=1).toPandas()
    assert set(out.columns) == {"series_id", "mode", "time", "amp", "func"}
    pf0 = out[out["mode"] == 0].sort_values("time")
    # the first PF's envelope should track the AM envelope (loose bound:
    # the reference ships no LMD tests at all, SURVEY.md §5)
    env_true = 1.0 + 0.5 * np.sin(2 * np.pi * 0.005 * t)
    amp = pf0["amp"].to_numpy()
    err = np.abs(amp[50:-50] - env_true[50:-50]).mean()
    assert err < 0.25


def test_ceemdan_two_tones_thresholds(spark):
    """reference tests/test_decomposition.py:8-30 thresholds, verbatim."""
    x = sustained_plus_gapped_pure_tones(spark)
    modes = CEEMDAN(ensemble_size=50, random_seed=42)(x).toPandas()
    piv = modes.pivot_table(index="time", columns="mode", values="value").sort_index()
    assert sorted(modes["mode"].unique()) == [0, 1]
    t = np.arange(1000)
    s2 = np.sin(2 * np.pi * 0.065 * t)
    s1 = np.zeros_like(s2)
    s1[500:750] += np.sin(2 * np.pi * 0.255 * np.arange(250))
    imf0, imf1 = piv[0].to_numpy(), piv[1].to_numpy()
    assert np.mean(np.square(imf0[11:490])) < 1e-4
    assert np.mean(np.square(imf0[761:990])) < 1e-4
    assert np.linalg.norm((imf0 - s1)[3:-3]) / np.linalg.norm(s1[3:-3]) < 0.10
    assert np.linalg.norm((imf1 - s2)[3:-3]) / np.linalg.norm(s2[3:-3]) < 0.05
    total = piv.sum(axis=1).to_numpy()
    assert np.linalg.norm(total - (s1 + s2)) / np.linalg.norm(s1 + s2) < 1e-15


def test_ceemdan_local_strategy_matches_ensemble(spark):
    """The bucketed per-series kernel ("local") and the distributed ensemble
    path must compute the same decomposition — same algorithm, same seeds;
    only float summation order differs (numpy sequential vs Spark avg)."""
    import pandas as pd

    t = np.arange(300).astype(float)
    x = np.sin(2 * np.pi * 0.06 * t) + 0.3 * np.sin(2 * np.pi * 0.011 * t)
    ts = spark.createDataFrame(
        pd.DataFrame({"series_id": "s", "time": t, "value": x})
    )
    kw = dict(ensemble_size=12, random_seed=5, max_modes=3)
    ens = CEEMDAN(strategy="ensemble", **kw)(ts).toPandas()
    loc = CEEMDAN(strategy="local", **kw)(ts).toPandas()
    pe = ens.pivot_table(index="time", columns="mode", values="value").sort_index()
    pl = loc.pivot_table(index="time", columns="mode", values="value").sort_index()
    assert list(pe.columns) == list(pl.columns)
    for k in pe.columns:
        denom = np.linalg.norm(pe[k]) or 1.0
        assert np.linalg.norm(pe[k] - pl[k]) / denom < 1e-6, f"mode {k}"


def test_lmd_survives_irregular_gap_short_series():
    """Regression (r6, found by the sf0.1 full audit): a short series whose
    largest extrema gap is huge relative to the median dt derived a
    smoothing window longer than the mirror pad can support — the
    convolution output shrank below n and the (Fc−mu)/env broadcast
    crashed the whole Spark stage. The window is now clamped to 2n−1; the
    amplitude-×-frequency reconstruction identity must still hold."""
    import numpy as np

    from periodicity_spark.decomposition.kernels import lmd

    t = np.array([0.0, 0.01, 0.02, 0.03, 0.04, 5.0, 5.01, 5.02, 5.03, 5.04])
    x = np.array([0.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 0.0])
    pfs, res = lmd(t, x)
    recon = sum(A * F for A, F in pfs) + res
    assert np.abs(recon - x).max() < 1e-12
