"""FFT family as per-series Arrow UDFs (reference core.py:546-555,980-984):
rfft on the (uniform) grid with optional oversampling, PSD = |·|², inverse.
Spark has no native FFT; Arrow batching keeps the transfer columnar and the
series axis is the parallel one (SURVEY.md §7 "what's hard").
Complex output is (re, im) columns — Spark has no complex type (SURVEY §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fft(ts: DataFrame, oversample: float = 1.0) -> DataFrame:
    """→ (series_id, frequency, re, im): rfft with nfft = oversample·N,
    frequencies rfftfreq(nfft, median_dt)."""
    ov = float(oversample)

    def _per_series(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("time")
        t = pdf["time"].to_numpy(float)
        x = pdf["value"].to_numpy(float)
        if len(x) < 2:
            return pd.DataFrame(columns=["series_id", "frequency", "re", "im"])
        dt = float(np.median(np.diff(t)))
        nfft = int(ov * len(x))
        freqs = np.fft.rfftfreq(n=nfft, d=dt)
        coefs = np.fft.rfft(x, n=nfft)
        return pd.DataFrame(
            {
                "series_id": pdf["series_id"].iloc[0],
                "frequency": freqs,
                "re": coefs.real,
                "im": coefs.imag,
            }
        )

    from periodicity_spark.session import grouped_apply

    # coarse hash buckets: per-series Arrow group overhead dominates short
    # FFT kernels at high series cardinality (see session.grouped_apply)
    return grouped_apply(
        ts.filter(F.col("value").isNotNull()),
        _per_series,
        "series_id string, frequency double, re double, im double",
    )


def psd(ts: DataFrame, oversample: float = 1.0) -> DataFrame:
    """→ pg rows (series_id, frequency, power): |rfft|² (reference psd,
    core.py:554-555). The squaring is native column math over fft()."""
    f = fft(ts, oversample)
    return f.select(
        "series_id",
        "frequency",
        (F.col("re") * F.col("re") + F.col("im") * F.col("im")).alias("power"),
    )


def ifft(fs: DataFrame, nfft: int | None = None) -> DataFrame:
    """Inverse of fft(): (series_id, frequency, re, im) → ts rows
    (reference ifft, core.py:980-984): time = arange(n)·dt, dt = 1/(n·df)."""
    nf = nfft

    def _per_series(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("frequency")
        coefs = pdf["re"].to_numpy(float) + 1j * pdf["im"].to_numpy(float)
        vals = np.fft.irfft(coefs, n=nf)
        df_ = float(np.median(np.diff(pdf["frequency"].to_numpy(float))))
        dt = 1.0 / (len(vals) * df_)
        return pd.DataFrame(
            {
                "series_id": pdf["series_id"].iloc[0],
                "time": np.arange(len(vals)) * dt,
                "value": vals,
            }
        )

    from periodicity_spark.session import grouped_apply

    return grouped_apply(
        fs, _per_series, "series_id string, time double, value double"
    )
