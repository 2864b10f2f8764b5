"""Missing-data repair, FIR smoothing, and noise estimation (SURVEY.md §2.5).

All native window expressions. The reference uses scipy/ndimage kernels
(core.py:369-457) — those have exact bounded-window formulations because FIR
kernels are finite.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

def _series_w():
    return Window.partitionBy("series_id").orderBy("time")


def interpolate_na(ts: DataFrame, method: str = "linear", **kwargs) -> DataFrame:
    """Fill NULL values (reference interpolate_na, core.py:664-701).

    methods: constant(k=0.0) / ffill / bfill / linear / random(mu, sd, seed).
    'linear' interpolates over the time coordinate and leaves leading/trailing
    NULLs (xarray interpolate_na semantics). 'mirror' (gap-local reflection)
    is sequential index arithmetic → see mirror_fill_udf below.
    """
    v = F.col("value")
    if method == "constant":
        k = float(kwargs.get("k", 0.0))
        return ts.fillna(k, subset=["value"])
    if method == "ffill":
        filled = F.last("value", ignorenulls=True).over(
            _series_w().rowsBetween(Window.unboundedPreceding, 0)
        )
        return ts.withColumn("value", filled)
    if method == "bfill":
        filled = F.first("value", ignorenulls=True).over(
            _series_w().rowsBetween(0, Window.unboundedFollowing)
        )
        return ts.withColumn("value", filled)
    if method == "linear":
        pw = _series_w().rowsBetween(Window.unboundedPreceding, 0)
        nw = _series_w().rowsBetween(0, Window.unboundedFollowing)
        pt = F.last(F.when(v.isNotNull(), F.col("time")), ignorenulls=True).over(pw)
        pv = F.last("value", ignorenulls=True).over(pw)
        nt = F.first(F.when(v.isNotNull(), F.col("time")), ignorenulls=True).over(nw)
        nv = F.first("value", ignorenulls=True).over(nw)
        blend = F.when(v.isNotNull(), v).when(
            pt.isNotNull() & nt.isNotNull(),
            pv + (nv - pv) * (F.col("time") - pt) / (nt - pt),
        )
        return ts.withColumn("value", blend)
    if method == "random":
        mu = kwargs.get("mu")
        sd = kwargs.get("sd")
        seed = kwargs.get("random_seed", 42)
        if mu is None or sd is None:
            raise ValueError("random fill on DataFrames requires explicit mu and sd")
        fill = F.lit(float(mu)) + F.lit(float(sd)) * F.randn(int(seed))
        return ts.withColumn("value", F.coalesce(v, fill))
    raise ValueError(f"unknown method {method!r}")


def _mirror_pad_rows(ts: DataFrame, k: int) -> DataFrame:
    """k mirrored rows each side (ndimage mode='mirror': edge sample not
    duplicated), tagged _pad=1; original rows tagged _pad=0."""
    w = _series_w()
    wn = Window.partitionBy("series_id")
    df = (
        ts.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
        .withColumn("_t0", F.min("time").over(wn))
        .withColumn("_t1", F.max("time").over(wn))
    )
    left = df.filter((F.col("_rn") >= 2) & (F.col("_rn") <= k + 1)).select(
        "series_id", (2 * F.col("_t0") - F.col("time")).alias("time"), "value", F.lit(1).alias("_pad")
    )
    right = df.filter(
        (F.col("_rn") <= F.col("_n") - 1) & (F.col("_rn") >= F.col("_n") - k)
    ).select(
        "series_id", (2 * F.col("_t1") - F.col("time")).alias("time"), "value", F.lit(1).alias("_pad")
    )
    mid = ts.select("series_id", "time", "value", F.lit(0).alias("_pad"))
    return mid.unionByName(left).unionByName(right)


def convolve(ts: DataFrame, kernel: list[float], mode: str = "mirror") -> DataFrame:
    """FIR filter with edge handling (reference convolve, core.py:442-457,
    ndimage.convolve mode='mirror').

    Native formulation: mirror-pad k rows per side (union of window-derived
    rows), then the dot product is Σⱼ kernel[j]·lead(value, c−j) — one
    WindowExec, no UDF. ndimage.convolve flips the kernel (true convolution);
    we flip here so asymmetric kernels match.
    """
    n = len(kernel)
    c = n // 2
    flipped = list(reversed([float(x) for x in kernel]))
    padded = _mirror_pad_rows(ts, max(c, n - 1 - c))
    w = _series_w()
    expr: Column = F.lit(0.0)
    for j, coef in enumerate(flipped):
        off = j - c
        if off == 0:
            term = F.col("value")
        elif off > 0:
            term = F.lead("value", off).over(w)
        else:
            term = F.lag("value", -off).over(w)
        expr = expr + F.lit(coef) * term
    return (
        padded.withColumn("_sm", expr)
        .filter(F.col("_pad") == 0)
        .select("series_id", "time", F.col("_sm").alias("value"))
    )


def smooth(ts: DataFrame, width: float, kernel: str = "gaussian") -> DataFrame:
    """Low-pass FIR (reference smooth, core.py:401-440):
    gaussian → ndimage.gaussian_filter (σ=width, truncate=4, mode=reflect);
    boxcar → width taps (half-weight edges when width is even);
    triangle → (1..half+1..1)/sum.
    """
    if kernel == "gaussian":
        sigma = float(width)
        radius = int(4.0 * sigma + 0.5)
        xs = [math.exp(-0.5 * (i / sigma) ** 2) for i in range(-radius, radius + 1)]
        s = sum(xs)
        taps = [x / s for x in xs]
        return _convolve_reflect(ts, taps)
    if kernel == "boxcar":
        width = int(width)
        if width % 2 == 0:
            taps = [1.0 / width] * (width + 1)
            taps[0] /= 2
            taps[-1] /= 2
        else:
            taps = [1.0 / width] * width
        return convolve(ts, taps)
    if kernel == "triangle":
        half = int(width // 2)
        ramp = list(range(1, half + 2)) + list(range(half, 0, -1))
        s = float(sum(ramp))
        return convolve(ts, [x / s for x in ramp])
    raise ValueError(f"Kernel type '{kernel}' is unknown.")


def _convolve_reflect(ts: DataFrame, kernel: list[float]) -> DataFrame:
    """Same as convolve() but ndimage mode='reflect' (edge sample duplicated)
    — what gaussian_filter uses. Implemented by clamping out-of-range taps
    onto mirrored in-range rows via reflected padding that includes the edge.
    For simplicity (and since gaussian radii are small), generate k reflect
    rows per side: positions 1..k mirrored to the outside including the edge
    sample."""
    k = len(kernel) // 2
    w = _series_w()
    wn = Window.partitionBy("series_id")
    df = (
        ts.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
        .withColumn("_t0", F.min("time").over(wn))
        .withColumn("_t1", F.max("time").over(wn))
    )
    # reflect (edge included): row i (1-based) maps to time t0 − (t_i − t0) − eps·i
    # we only need correct ordering + values, the pad rows are dropped after.
    left = df.filter(F.col("_rn") <= k).select(
        "series_id",
        (2 * F.col("_t0") - F.col("time") - (F.col("_t1") - F.col("_t0")) * F.lit(1e-12)).alias("time"),
        "value",
        F.lit(1).alias("_pad"),
    )
    right = df.filter(F.col("_rn") >= F.col("_n") - k + 1).select(
        "series_id",
        (2 * F.col("_t1") - F.col("time") + (F.col("_t1") - F.col("_t0")) * F.lit(1e-12)).alias("time"),
        "value",
        F.lit(1).alias("_pad"),
    )
    mid = ts.select("series_id", "time", "value", F.lit(0).alias("_pad"))
    padded = mid.unionByName(left).unionByName(right)
    flipped = list(reversed(kernel))
    c = len(kernel) // 2
    expr: Column = F.lit(0.0)
    for j, coef in enumerate(flipped):
        off = j - c
        if off == 0:
            term = F.col("value")
        elif off > 0:
            term = F.lead("value", off).over(w)
        else:
            term = F.lag("value", -off).over(w)
        expr = expr + F.lit(coef) * term
    return (
        padded.withColumn("_sm", expr)
        .filter(F.col("_pad") == 0)
        .select("series_id", "time", F.col("_sm").alias("value"))
    )


def rolling_median3_residual(ts: DataFrame) -> DataFrame:
    """value − median_filter(value, 3) (reference estimate_noise first step,
    core.py:384; ndimage mode=reflect ⇒ edges use the duplicated edge sample,
    so edge median = median(x0, x0, x1))."""
    w = _series_w()
    prev = F.coalesce(F.lag("value").over(w), F.col("value"))
    nxt = F.coalesce(F.lead("value").over(w), F.col("value"))
    v = F.col("value")
    med3 = F.greatest(F.least(prev, v), F.least(F.greatest(prev, v), nxt))
    return ts.select("series_id", "time", (v - med3).alias("value"))


def estimate_noise(ts: DataFrame, sigma: float = 3.0, n_iter: int = 3) -> DataFrame:
    """k-sigma-clipped std of the median-filter residual, ÷0.893421
    (reference core.py:369-399). The clip loop is a driver loop of n_iter
    cheap aggregate jobs over the cached residual — each job is one shuffle.
    Returns (series_id, noise)."""
    residue = rolling_median3_residual(ts).withColumnRenamed("value", "_r")
    residue = residue.filter(F.col("_r").isNotNull())
    residue.cache()
    try:
        kept = residue
        stats = None
        for _ in range(n_iter):
            # reference: stats over the kept set, re-clip over the FULL residue
            stats = kept.groupBy("series_id").agg(
                F.avg("_r").alias("_mu"), F.stddev_pop("_r").alias("_sd")
            )
            stats.cache().count()
            kept = (
                residue.join(F.broadcast(stats), "series_id")
                .filter(F.abs(F.col("_r") - F.col("_mu")) < F.lit(sigma) * F.col("_sd"))
                .select("series_id", "time", "_r")
            )
        return stats.select(
            "series_id", (F.col("_sd") / F.lit(0.893421)).alias("noise")
        )
    finally:
        residue.unpersist()
