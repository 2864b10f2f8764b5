"""Synthetic signal generators, as Spark DataFrames built from spark.range.

Spark-first equivalents of the reference's bundled generators
(reference data/__init__.py:67-173): the whole series is declared as column
expressions over ``spark.range`` — no driver-side arrays — so a generator at
N=1e9 rows is still a distributed plan.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TWO_PI = 2.0 * math.pi


def sine(
    spark: SparkSession,
    n: int = 100,
    period: float = 10.0,
    series_id: str = "sine",
    t0: float = 0.0,
    dt: float = 1.0,
    amp: float = 1.0,
) -> DataFrame:
    """value = amp*sin(2π·t/period) on a uniform grid (tests/test_spectral.py:27-31)."""
    return spark.range(n).select(
        F.lit(series_id).alias("series_id"),
        (F.lit(t0) + F.col("id") * F.lit(dt)).cast("double").alias("time"),
        (F.lit(amp) * F.sin(F.lit(TWO_PI / period) * (F.lit(t0) + F.col("id") * F.lit(dt)))).alias("value"),
    )


def constant(spark: SparkSession, n: int, dt: float = 0.1, value: float = 1.0, series_id: str = "const") -> DataFrame:
    return spark.range(n).select(
        F.lit(series_id).alias("series_id"),
        (F.col("id") * F.lit(dt)).cast("double").alias("time"),
        F.lit(float(value)).alias("value"),
    )


def sustained_plus_gapped_pure_tones(spark: SparkSession, series_id: str = "two_tones") -> DataFrame:
    """Two-tone fixture (reference data/__init__.py:105-123): a sustained
    0.065-cycle sine over t∈[0,1000) plus a 0.255-cycle burst on t∈[500,750)."""
    t = F.col("id").cast("double")
    sustained = F.sin(F.lit(TWO_PI * 0.065) * t)
    burst = F.when(
        (t >= 500) & (t < 750), F.sin(F.lit(TWO_PI * 0.255) * (t - F.lit(500.0)))
    ).otherwise(F.lit(0.0))
    return spark.range(1000).select(
        F.lit(series_id).alias("series_id"),
        t.alias("time"),
        (sustained + burst).alias("value"),
    )


def duffing_wave(spark: SparkSession, n: int = 1024, series_id: str = "duffing") -> DataFrame:
    """Damped chirp (reference data/__init__.py:154-173 shape)."""
    t = F.col("id").cast("double") / F.lit(n / 8.0)
    return spark.range(n).select(
        F.lit(series_id).alias("series_id"),
        t.alias("time"),
        (F.exp(-t / F.lit(8.0)) * F.sin(F.lit(TWO_PI) * t * (F.lit(1.0) + t / F.lit(16.0)))).alias("value"),
    )


def bpsk(
    spark: SparkSession,
    t_bit: int = 10,
    n_bits: int = 4000,
    f_c: float = 0.05,
    n0_db: float = float("-inf"),
    seed: int = 42,
    series_id: str = "bpsk",
) -> DataFrame:
    """Noisy BPSK signal (reference data/__init__.py:67-102, doctest shape
    t_bit·n_bits). Complex-valued → (series_id, time, re, im) columns.

    Spark-first: the per-bit ±1 symbol is a hash of the bit index (a
    deterministic distributed choice where the reference draws
    np.random.choice serially), the rectangular pulse shaping is id-div
    arithmetic (the reference's convolve with ones(t_bit) is exactly
    bit-held symbols), and the complex carrier/noise are column expressions.
    Like the reference, noise is scaled by its own empirical variance to hit
    the requested N0 — one tiny broadcast aggregate."""
    t0 = t_bit * n_bits
    base = spark.range(t0).select(
        F.col("id"),
        (F.when(F.xxhash64(F.col("id") - F.col("id") % t_bit, F.lit(seed)) % 2 == 0, -1.0)
         .otherwise(1.0)).alias("_sym"),
        F.randn(seed).alias("_nre"),
        F.randn(seed + 1).alias("_nim"),
    )
    if n0_db == float("-inf"):
        base = base.withColumn("_scale", F.lit(0.0))
    else:
        n0 = 10.0 ** (n0_db / 10.0)
        # empirical complex variance E|z|² − |E z|² (np.var on complex)
        stats = base.agg(
            (F.avg(F.col("_nre") * F.col("_nre") + F.col("_nim") * F.col("_nim"))
             - F.avg("_nre") * F.avg("_nre") - F.avg("_nim") * F.avg("_nim")
             ).alias("_var")
        )
        base = base.crossJoin(F.broadcast(stats)).withColumn(
            "_scale", F.sqrt(F.lit(n0) / F.col("_var"))
        )
    phase = F.lit(TWO_PI * f_c) * F.col("id").cast("double")
    return base.select(
        F.lit(series_id).alias("series_id"),
        F.col("id").cast("double").alias("time"),
        (F.col("_sym") * F.cos(phase) + F.col("_scale") * F.col("_nre")).alias("re"),
        (F.col("_sym") * F.sin(phase) + F.col("_scale") * F.col("_nim")).alias("im"),
    )


def gaussian_atoms_plus_fm_sinusoid(
    spark: SparkSession, series_id: str = "atoms_fm"
) -> DataFrame:
    """Two Gaussian atoms + an FM sinusoid (reference data/__init__.py:126-151,
    doctest shape 2000) as one expression plan over n ∈ [1, 2000]."""
    fmax = 3.0 / 32.0
    fmin = 9.0 / 128.0
    phi = -math.acos((3 * fmin - fmax) / (fmax + fmin))
    n = (F.col("id") + 1).cast("double")
    x1 = (
        F.lit(3.0)
        * F.exp(-F.pow((n - 500) / 100, 2))
        * F.cos(F.lit(TWO_PI * 5 / 16) * (n - 1000))
    )
    x2 = F.cos(
        F.lit(TWO_PI * (fmax + fmin) / 2) * (n - 1000)
        + F.lit((fmax - fmin) / 2 * 1000)
        * (F.sin(F.lit(TWO_PI) * n / 1000) + F.lit(phi - math.sin(phi)))
    )
    x3 = F.exp(-F.pow((n - 1000) / 200, 2)) * F.cos(F.lit(TWO_PI * 7 / 256) * (n - 1000))
    return spark.range(2000).select(
        F.lit(series_id).alias("series_id"),
        n.alias("time"),
        (x1 + x2 + x3).alias("value"),
    )


def gappy_sine(
    spark: SparkSession,
    n: int = 1000,
    period: float = 50.0,
    null_every: int = 17,
    gap_ranges: tuple[tuple[int, int], ...] = ((300, 340), (700, 760)),
    series_id: str = "gappy",
) -> DataFrame:
    """Uniform sine with NULL runs and removed spans — exercises split /
    fill_gaps / interpolate_na (reference core.py:619-627,664-715)."""
    t = F.col("id").cast("double")
    keep = F.lit(True)
    for lo, hi in gap_ranges:
        keep = keep & ~((F.col("id") >= lo) & (F.col("id") < hi))
    value = F.sin(F.lit(TWO_PI / period) * t)
    value = F.when(F.col("id") % null_every == 0, F.lit(None)).otherwise(value)
    return (
        spark.range(n)
        .where(keep)
        .select(F.lit(series_id).alias("series_id"), t.alias("time"), value.alias("value"))
    )
