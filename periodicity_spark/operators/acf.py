"""Autocorrelation (reference acf(), core.py:578-608).

Two paths, like the reference's own algorithmic choice:

- ``acf_lag_grid`` — native windowed-lead formulation over a uniform
  positional grid: for a uniformly-sampled series, ACF(k·dt) = Σᵢ yᵢ·yᵢ₊ₖ
  normalized by lag 0. One window sort shared by all max_lag lead columns,
  per-series sums reusing the window's partitioning — a single shuffle of
  the input rows (the right formulation when max_lag ≪ N; the former
  (rows × lags) self-join shuffled the expanded pairs).
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
    # One window pass instead of a (rows × lags) self-join: Σᵢ yᵢ·yᵢ₊ₖ is
    # sum(value · lead(value, k)) over the time order — the max_lag lead
    # columns share one sort, the per-series aggregate reuses the window's
    # hash partitioning (zero additional exchanges), and lag 0's sum IS
    # the normalizer, so the former lag-0 self-join disappears too. The
    # join formulation shuffled the rows×lags pair expansion; this moves
    # each input row once. A lag with no pairs (series shorter than k+1)
    # yields a NULL sum and is dropped, matching the join's absent rows.
    lead_prods = base.select(
        "series_id",
        *[
            (
                F.col("value") * F.col("value")
                if k == 0
                else F.col("value") * F.lead("value", k).over(w)
            ).alias(f"_p{k}")
            for k in range(max_lag)
        ],
    )
    sums = lead_prods.groupBy("series_id").agg(
        F.array(*[F.sum(f"_p{k}") for k in range(max_lag)]).alias("_nums")
    )
    lagged = sums.select(
        "series_id",
        F.posexplode("_nums").alias("_lag", "_num"),
        F.col("_nums")[0].alias("_den"),
    )
    return lagged.filter(F.col("_num").isNotNull()).select(
        "series_id",
        F.col("_lag").cast("double").alias("lag"),
        # try_divide: a constant (or single-repeated-sample) series has
        # zero lag-0 autocovariance — ACF is undefined there and must be
        # NULL, not an ANSI abort of the whole stage
        F.try_divide(F.col("_num"), F.col("_den")).alias("acf"),
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

    from periodicity_spark.session import grouped_apply

    # coarse hash buckets: per-series Arrow group overhead dominates the
    # O(N log N) kernel at high series cardinality (session.grouped_apply)
    return grouped_apply(
        ts.filter(F.col("value").isNotNull()), _per_series, out_schema
    )
