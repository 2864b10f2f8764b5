"""Stellingwerf Phase Dispersion Minimization, Spark-first
(reference phase.py:75-195).

Θ(P) = [Σⱼ (nⱼ−1)sⱼ² / (Σⱼ nⱼ − M)] / σ² over nb·nc overlapping cover-bins of
the phase fold. The reference Pools over the period grid (phase.py:185-186);
here: crossJoin the period grid, explode each sample into its nc covering
bins (sample with ⌊φ·m₀⌋ = b belongs to cover-bins (b−i) mod m₀, i<nc —
equivalent to the reference's mask logic phase.py:137-144), then two
aggregations. Pure native SQL; shuffle keys (series, period, bin) then
(series, period).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from periodicity_spark.functions.expressions import fold_expr
from periodicity_spark.functions.stats import series_stats


def pdm_theta(ts: DataFrame, periods: DataFrame, nb: int = 5, nc: int = 2) -> DataFrame:
    """→ (series_id, period, theta). periods: (period) or (series_id, period).
    Series with zero sample variance are dropped (Θ undefined).

    Shuffle economy: the heavy aggregate groups the N·P fold by BASE bin
    only — (n, Σv, Σv²) moments — and the nc-fold cover expansion happens
    on the AGGREGATED table (series·P·m₀ rows, ~N/nb smaller), where the
    moments are summed over the nc adjacent base bins and the cover
    variance recovered as (Σv² − (Σv)²/n)/(n−1). Identical mathematics to
    per-cover var_samp (the reference's masked np.var, phase.py:137-144);
    cuts the shuffled volume ×nc versus exploding covers before the
    aggregate. Θ values agree with the two-pass formulation to ~1e-13
    relative (raw-moment vs pairwise-merge variance)."""
    m0 = nb * nc
    from periodicity_spark.session import scan_parallel

    # the N×P fold expansion + base-bin partial aggregate run inside the
    # scan tasks; floor the parallelism so a single-row-group input does
    # not serialize them onto one core (no-op on well-partitioned scans)
    # probe the caller's frame, then filter — the filter pushes through the
    # repartition, so the executed plan is unchanged, and a repeat caller's
    # Dataset probes from its cached RDD instead of a cold re-plan
    base = scan_parallel(ts).filter(F.col("value").isNotNull())
    sig = base.groupBy("series_id").agg(F.var_samp("value").alias("_sigma"))
    if "series_id" in periods.columns:
        crossed = base.join(periods, "series_id")
    else:
        crossed = base.crossJoin(F.broadcast(periods))
    mom = (
        crossed.select(
            "series_id",
            "period",
            F.floor(fold_expr("time", F.col("period")) * m0).cast("long").alias("_b"),
            "value",
        )
        .groupBy("series_id", "period", "_b")
        .agg(
            F.count(F.lit(1)).alias("_n0"),
            F.sum("value").alias("_s1"),
            F.sum(F.col("value") * F.col("value")).alias("_s2"),
        )
    )
    covers = F.explode(F.sequence(F.lit(0), F.lit(nc - 1))).alias("_i")
    cov = mom.select(
        "series_id", "period", "_b", "_n0", "_s1", "_s2", covers
    ).select(
        "series_id",
        "period",
        (((F.col("_b") - F.col("_i")) % m0 + m0) % m0).alias("bin"),
        "_n0",
        "_s1",
        "_s2",
    )
    bstats = (
        cov.groupBy("series_id", "period", "bin")
        .agg(
            F.sum("_n0").alias("_nj"),
            F.sum("_s1").alias("_t1"),
            F.sum("_s2").alias("_t2"),
        )
        .filter(F.col("_nj") > 1)
    )
    # Σⱼ(nⱼ−1)sⱼ² = Σⱼ(Σv² − (Σv)²/nⱼ) — the (nⱼ−1) cancels
    theta = bstats.groupBy("series_id", "period").agg(
        (
            F.sum(F.col("_t2") - F.col("_t1") * F.col("_t1") / F.col("_nj"))
            / (F.sum("_nj") - F.count(F.lit(1)))
        ).alias("_ss")
    )
    return (
        theta.join(F.broadcast(sig.filter(F.col("_sigma") > 0)), "series_id")
        .select("series_id", "period", (F.col("_ss") / F.col("_sigma")).alias("theta"))
    )


class PDM:
    """Reference-default grid linspace(p_min, p_max, n): p_min = 2·median_dt,
    p_max = oversample·baseline (phase.py:167-180). Subharmonic averaging
    (phase.py:188-193) = a self-join of the Θ table on period ↔ 2·period."""

    def __init__(
        self,
        nb: int = 5,
        nc: int = 2,
        p_min: float | None = None,
        p_max: float | None = None,
        n_periods: int = 1000,
        oversample: float = 1.0,
        do_subharmonic: bool = False,
    ):
        self.nb = nb
        self.nc = nc
        self.p_min = p_min
        self.p_max = p_max
        self.n_periods = n_periods
        self.oversample = oversample
        self.do_subharmonic = do_subharmonic

    def __call__(self, ts: DataFrame) -> DataFrame:
        n = self.n_periods
        st = series_stats(ts).select(
            "series_id",
            "n",
            (
                F.lit(self.p_min)
                if self.p_min is not None
                else 2 * F.col("median_dt")
            ).alias("_pmin"),
            (
                F.lit(self.p_max)
                if self.p_max is not None
                else F.lit(self.oversample) * F.col("baseline")
            ).alias("_pmax"),
        )
        grid = st.select(
            "series_id",
            "n",
            "_pmin",
            "_pmax",
            F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("_k"),
        ).select(
            "series_id",
            "n",
            "_pmin",
            (
                F.col("_pmin")
                + F.col("_k") * (F.col("_pmax") - F.col("_pmin")) / F.lit(float(n - 1))
            ).alias("period"),
        )
        theta = pdm_theta(ts, grid.select("series_id", "period"), self.nb, self.nc)
        if not self.do_subharmonic:
            return theta
        # subharmonic pass (phase.py:188-193): Θ(P) ← (Θ(P) + Θ(2P))/2 where
        # Θ(P) < Θ_crit and 2P is on the grid. Θ_crit = 1 − 11/n^0.8.
        dp = grid.groupBy("series_id").agg(
            ((F.max("period") - F.min("period")) / F.lit(float(n - 1))).alias("_dp"),
            F.min("period").alias("_p0"),
            F.first("n").alias("_n"),
        )
        t = theta.join(F.broadcast(dp), "series_id").withColumn(
            "_idx", F.round((F.col("period") - F.col("_p0")) / F.col("_dp")).cast("long")
        )
        # index of the subharmonic row: round(2·idx + p_min/dp) (phase.py:192)
        sub = t.select(
            F.col("series_id").alias("_sid"),
            F.col("_idx").alias("_sub_idx"),
            F.col("theta").alias("_sub_theta"),
        )
        crit = 1.0 - 11.0 / F.pow(F.col("_n").cast("double"), F.lit(0.8))
        joined = t.withColumn(
            "_want", F.round(2 * F.col("_idx") + F.col("_p0") / F.col("_dp")).cast("long")
        ).join(
            sub,
            (F.col("series_id") == F.col("_sid")) & (F.col("_want") == F.col("_sub_idx")),
            "left",
        )
        avg = F.when(
            (F.col("theta") < crit) & F.col("_sub_theta").isNotNull(),
            (F.col("theta") + F.col("_sub_theta")) / 2,
        ).otherwise(F.col("theta"))
        return joined.select("series_id", "period", avg.alias("theta"))
