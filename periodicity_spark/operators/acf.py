"""Autocorrelation (reference acf(), core.py:578-608).

Two paths, like the reference's own algorithmic choice:

- ``acf_lag_grid`` — native lag-join over a uniform positional grid: for a
  uniformly-sampled series, ACF(k·dt) = Σᵢ yᵢ·yᵢ₊ₖ normalized by lag 0. One
  self-join on (series_id, position+k) against a broadcast lag grid, fully
  distributed (the right formulation when max_lag ≪ N).
- ``acf_fft`` — per-series Arrow UDF: IFFT of the 2×-zero-padded PSD,
  exactly the reference algorithm (core.py:603-607), parallel across series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def acf_lag_grid(ts: DataFrame, max_lag: int, demean: bool = True) -> DataFrame:
    """→ (series_id, lag, acf) for integer positional lags 0..max_lag−1.

    acf(k) = Σ (yᵢ−ȳ)(yᵢ₊ₖ−ȳ) / Σ (yᵢ−ȳ)² — the standard biased estimator
    (what the reference's FFT path computes on a uniform grid, without the
    oversample-padding artifacts).
    """
    w = Window.partitionBy("series_id").orderBy("time")
    base = ts.filter(F.col("value").isNotNull())
    if demean:
        mean = base.groupBy("series_id").agg(F.avg("value").alias("_mu"))
        base = base.join(F.broadcast(mean), "series_id").withColumn(
            "value", F.col("value") - F.col("_mu")
        )
    pos = base.select(
        "series_id", (F.row_number().over(w) - 1).alias("pos"), "value"
    )
    lags = pos.sparkSession.range(max_lag).select(F.col("id").cast("int").alias("lag"))
    left = pos.select("series_id", "pos", F.col("value").alias("_y0"))
    right = pos.select(
        F.col("series_id").alias("_sid"), F.col("pos").alias("_pos1"), F.col("value").alias("_y1")
    )
    prods = (
        left.crossJoin(F.broadcast(lags))
        .join(
            right,
            (F.col("series_id") == F.col("_sid"))
            & (F.col("_pos1") == F.col("pos") + F.col("lag")),
        )
        .groupBy("series_id", "lag")
        .agg(F.sum(F.col("_y0") * F.col("_y1")).alias("_num"))
    )
    lag0 = prods.filter(F.col("lag") == 0).select(
        F.col("series_id").alias("_sid0"), F.col("_num").alias("_den")
    )
    return (
        prods.join(F.broadcast(lag0), prods["series_id"] == F.col("_sid0"))
        .select(
            "series_id",
            F.col("lag").cast("double").alias("lag"),
            # try_divide: a constant (or single-repeated-sample) series has
            # zero lag-0 autocovariance — ACF is undefined there and must be
            # NULL, not an ANSI abort of the whole stage
            F.try_divide(F.col("_num"), F.col("_den")).alias("acf"),
        )
    )


def acf_fft(ts: DataFrame, max_lag: int | None = None, unbias: bool = False) -> DataFrame:
    """Reference-exact ACF (core.py:578-608): IFFT of the oversample=2
    zero-padded PSD, normalized to lag 0, truncated to max_lag; lags reported
    as time offsets t − tmin. Per-series Arrow-batched applyInPandas —
    parallel across series, O(N log N) within one."""
    out_schema = "series_id string, lag double, acf double"

    # closure is self-contained (imports inside) so cloudpickle ships it by
    # value — executors don't need the package on their PYTHONPATH
    def _per_series(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("time")
        y = pdf["value"].to_numpy(dtype=float)
        t = pdf["time"].to_numpy(dtype=float)
        n = len(y)
        ml = max_lag if max_lag is not None else n // 2
        lags = t - t.min()
        if isinstance(ml, float):
            ml = int(np.searchsorted(lags, ml) + 1)
        ml = min(ml, n)
        nfft = int(2.0 * n)
        yc = y - np.nanmean(y)
        psd = np.abs(np.fft.rfft(yc, n=nfft)) ** 2
        ryy = np.fft.irfft(psd)
        if unbias:
            ones = np.ones_like(yc)
            corr = np.fft.irfft(np.abs(np.fft.rfft(ones, n=nfft)) ** 2)
            with np.errstate(divide="ignore", invalid="ignore"):
                ryy = ryy / corr
        ryy = ryy[:ml] / ryy[0]
        return pd.DataFrame(
            {"series_id": pdf["series_id"].iloc[0], "lag": lags[:ml], "acf": ryy}
        )

    return (
        ts.filter(F.col("value").isNotNull())
        .groupBy("series_id")
        .applyInPandas(_per_series, out_schema)
    )
