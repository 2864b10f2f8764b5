"""GLS bootstrap null distribution + FAP/FAL + sinusoid model fit
(reference spectral.py:140-204), Spark-first.

Bootstrap: the reference loops n_bootstraps sequential re-runs
(spectral.py:145-150); here every (series, replicate) is one group of a
single distributed GLS — the replicate axis is exploded into the series key,
so 100 replicates × 1000 series × F frequencies is one shuffle, not a loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from periodicity_spark.spectral.gls import gls_periodogram


def gls_bootstrap_replicates(
    ts: DataFrame,
    freq_grid: DataFrame,
    n_bootstraps: int = 100,
    seed: int = 42,
) -> DataFrame:
    """→ (series_id, bootstrap_id, max_power): max GLS power of each
    values-resampled-with-replacement replicate (reference spectral.py:140-152).
    """
    spark = ts.sparkSession
    base = ts.filter(F.col("value").isNotNull())
    w = Window.partitionBy("series_id").orderBy("time")
    pos = base.select(
        "series_id",
        "time",
        (F.row_number().over(w) - 1).alias("_pos"),
        F.count(F.lit(1)).over(Window.partitionBy("series_id")).alias("_n"),
    )
    boots = spark.range(n_bootstraps).select(F.col("id").cast("int").alias("bootstrap_id"))
    # each (row, replicate) draws a random source position; values join back
    # by (series, position) — the resample is one equi-join, no driver RNG
    drawn = (
        pos.crossJoin(F.broadcast(boots))
        .withColumn("_src", F.floor(F.rand(seed) * F.col("_n")).cast("int"))
    )
    vals = base.select(
        F.col("series_id").alias("_sid"),
        (F.row_number().over(w) - 1).alias("_vpos"),
        F.col("value").alias("_v"),
    )
    resampled = drawn.join(
        vals, (F.col("series_id") == F.col("_sid")) & (F.col("_src") == F.col("_vpos"))
    ).select(
        F.concat_ws("#", F.col("series_id"), F.col("bootstrap_id")).alias("series_id"),
        "time",
        F.col("_v").alias("value"),
    )
    pg = gls_periodogram(resampled, freq_grid=freq_grid)
    rep = pg.groupBy("series_id").agg(F.max("power").alias("max_power"))
    split = F.split(F.col("series_id"), "#")
    return rep.select(
        split.getItem(0).alias("series_id"),
        split.getItem(1).cast("int").alias("bootstrap_id"),
        "max_power",
    )


def fap(replicates: DataFrame, observed_power: DataFrame) -> DataFrame:
    """False-alarm probability of each observed power: mean(power < replicate)
    (reference spectral.py:154-160). observed: (series_id, power)."""
    obs = observed_power.select("series_id", F.col("power").alias("_p"))
    return (
        replicates.join(obs, "series_id")
        .groupBy("series_id")
        .agg(F.avg((F.col("_p") < F.col("max_power")).cast("double")).alias("fap"))
    )


def fal(replicates: DataFrame, fap_level: float) -> DataFrame:
    """False-alarm level: quantile(replicates, 1 − fap)
    (reference spectral.py:162-163)."""
    return replicates.groupBy("series_id").agg(
        F.percentile_approx("max_power", 1.0 - fap_level).alias("fal")
    )


def gls_model(ts: DataFrame, f0: float, new_times: DataFrame, err_col: str | None = None) -> DataFrame:
    """Least-squares fit of offset + sinusoid at frequency f0, evaluated on
    ``new_times`` (reference model(), spectral.py:169-204). Fully native:
    the 3×3 normal equations' six unique entries come from one aggregation;
    Cramer's rule solves them as column math; prediction is a projection.
    new_times: (time) or (series_id, time)."""
    import math

    base = ts.filter(F.col("value").isNotNull())
    werr = F.lit(1.0) if err_col is None else F.pow(F.col(err_col), -2.0)
    tau = F.lit(2.0 * math.pi * f0)
    s, c = F.sin(tau * F.col("time")), F.cos(tau * F.col("time"))
    prep = base.select(
        "series_id", "time", "value", werr.alias("_w"), s.alias("_s"), c.alias("_c")
    )
    mean_df = prep.groupBy("series_id").agg(
        (F.sum(F.col("_w") * F.col("value")) / F.sum("_w")).alias("_ymean")
    )
    g = (
        prep.join(F.broadcast(mean_df), "series_id")
        .withColumn("_y", F.col("value") - F.col("_ymean"))
        .groupBy("series_id")
        .agg(
            F.sum("_w").alias("a11"),
            F.sum(F.col("_w") * F.col("_s")).alias("a12"),
            F.sum(F.col("_w") * F.col("_c")).alias("a13"),
            F.sum(F.col("_w") * F.col("_s") * F.col("_s")).alias("a22"),
            F.sum(F.col("_w") * F.col("_s") * F.col("_c")).alias("a23"),
            F.sum(F.col("_w") * F.col("_c") * F.col("_c")).alias("a33"),
            F.sum(F.col("_w") * F.col("_y")).alias("b1"),
            F.sum(F.col("_w") * F.col("_s") * F.col("_y")).alias("b2"),
            F.sum(F.col("_w") * F.col("_c") * F.col("_y")).alias("b3"),
            F.first("_ymean").alias("_ymean"),
        )
    )
    det = (
        F.col("a11") * (F.col("a22") * F.col("a33") - F.col("a23") * F.col("a23"))
        - F.col("a12") * (F.col("a12") * F.col("a33") - F.col("a23") * F.col("a13"))
        + F.col("a13") * (F.col("a12") * F.col("a23") - F.col("a22") * F.col("a13"))
    )
    t1 = (
        F.col("b1") * (F.col("a22") * F.col("a33") - F.col("a23") * F.col("a23"))
        - F.col("a12") * (F.col("b2") * F.col("a33") - F.col("a23") * F.col("b3"))
        + F.col("a13") * (F.col("b2") * F.col("a23") - F.col("a22") * F.col("b3"))
    )
    t2 = (
        F.col("a11") * (F.col("b2") * F.col("a33") - F.col("b3") * F.col("a23"))
        - F.col("b1") * (F.col("a12") * F.col("a33") - F.col("a23") * F.col("a13"))
        + F.col("a13") * (F.col("a12") * F.col("b3") - F.col("b2") * F.col("a13"))
    )
    t3 = (
        F.col("a11") * (F.col("a22") * F.col("b3") - F.col("a23") * F.col("b2"))
        - F.col("a12") * (F.col("a12") * F.col("b3") - F.col("b2") * F.col("a13"))
        + F.col("b1") * (F.col("a12") * F.col("a23") - F.col("a22") * F.col("a13"))
    )
    # Singular AND near-singular systems yield NULL predictions, not noise:
    # a degenerate series (constant, single-point, duplicate times) has
    # det = 0 exactly, but an UNDERDETERMINED one (n < 3 samples, or all
    # times phase-aliased so the sin column ~vanishes) leaves det as pure
    # floating-point cancellation noise — at sf5 three such series (n=2-4,
    # |det|/|a11·a22·a33| of 1e-16..1e-7) amplified engine-vs-oracle
    # summation-order differences into 6th-decimal output disagreements.
    # The guard is RELATIVE (Hadamard-style scale |a11·a22·a33|): below
    # rtol=1e-6 the solution is numerically meaningless in ANY engine —
    # a well-conditioned trig system sits at 1e-2..1, three decades away.
    scale3 = F.abs(F.col("a11") * F.col("a22") * F.col("a33"))
    det_ok = F.when(F.abs(det) > F.lit(1e-6) * scale3, det)
    theta = g.select(
        "series_id",
        F.try_divide(t1, det_ok).alias("_th0"),
        F.try_divide(t2, det_ok).alias("_th1"),
        F.try_divide(t3, det_ok).alias("_th2"),
        "_ymean",
    )
    if "series_id" not in new_times.columns:
        sids = ts.select("series_id").distinct()
        new_times = sids.crossJoin(new_times)
    pred = new_times.join(F.broadcast(theta), "series_id").select(
        "series_id",
        "time",
        (
            F.col("_ymean")
            + F.col("_th0")
            + F.col("_th1") * F.sin(tau * F.col("time"))
            + F.col("_th2") * F.cos(tau * F.col("time"))
        ).alias("value"),
    )
    return pred
