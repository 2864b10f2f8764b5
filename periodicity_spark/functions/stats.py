"""Per-series scalar statistics as one distributed aggregation.

The reference computes baseline / median_dt / dt as eager properties
(core.py:504-519); several operators branch on them (grid derivation in GLS,
spectral.py:88-97; p_min/p_max in PDM, phase.py:167-175). Here they are one
groupBy over the ts table returning a small stats DataFrame, broadcastable
into downstream plans.

``dt`` (uniform spacing) is only defined when sampling is uniform — the
reference raises otherwise (core.py:512-519). We carry ``is_uniform`` as a
boolean computed with the same tolerance (isclose on diffs vs median diff)
and let callers assert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RTOL = 1e-05
_ATOL = 1e-08


def series_stats(ts: DataFrame) -> DataFrame:
    """→ (series_id, n, n_value, mean, std, vmin, vmax, tmin, tmax,
          baseline, median_dt, is_uniform, dt)"""
    # window lag + isclose condition as SQL strings parsed JVM-side (the
    # Column build cost ~280 ms of py4j round-trips per plan, guide §5);
    # literal positions mirror Python's reflected operators so the trees
    # match the former Column build exactly (optimizedPlan-diffed on every
    # series_stats-consuming declared query)
    diffs = ts.selectExpr(
        "series_id",
        "time",
        "value",
        "time - lag(time) OVER (PARTITION BY series_id ORDER BY time) AS dt_i",
    )
    # median_dt first, then a second pass for the numpy.isclose-style
    # uniformity check: |dt_i − m| ≤ atol + rtol·|m| for every gap.
    med = diffs.groupBy("series_id").agg(F.expr("median(dt_i) AS median_dt"))
    uni = (
        diffs.join(med, "series_id")
        .groupBy("series_id")
        .agg(
            F.expr(
                "bool_and(dt_i IS NULL OR abs(dt_i - median_dt)"
                f" <= abs(median_dt) * {_RTOL!r}D + {_ATOL!r}D) AS is_uniform"
            )
        )
    )
    # the eight-aggregate block as parsed SQL strings too (r11 — the eight
    # Column builds measured ~32 py4j round-trips per plan; the parsed
    # trees are node-identical, pinned by the plan-identity test)
    base = ts.groupBy("series_id").agg(
        F.expr("count(1) AS n"),
        F.expr("count(value) AS n_value"),
        F.expr("avg(value) AS mean"),
        F.expr("stddev_samp(value) AS std"),
        F.expr("min(value) AS vmin"),
        F.expr("max(value) AS vmax"),
        F.expr("min(time) AS tmin"),
        F.expr("max(time) AS tmax"),
    )
    out = (
        base.join(med, "series_id", "left")
        .join(uni, "series_id", "left")
        .selectExpr(
            "*",
            "tmax - tmin AS baseline",
            "CASE WHEN is_uniform THEN median_dt END AS dt",
        )
    )
    return out.select(
        "series_id", "n", "n_value", "mean", "std", "vmin", "vmax",
        "tmin", "tmax", "baseline", "median_dt", "is_uniform", "dt",
    )


def pg_stats(pg: DataFrame) -> DataFrame:
    """Per-series FSeries accessors as one aggregation (reference
    core.py:913-942): → (series_id, fmax, pmax, median_df, median_dp,
    is_uniform_f, df). ``fmax``/``pmax`` are the frequency/period at max
    power; ``median_df``/``median_dp`` the median grid steps (dp negated
    like the reference, since period decreases as frequency increases);
    ``df`` is NULL when the frequency grid is non-uniform (the reference
    raises — callers assert on is_uniform_f)."""
    # every projection/aggregate as parsed SQL strings (r11 — the window
    # selects and the five-aggregate block measured ~70 py4j round-trips
    # per plan build). Literal spellings mirror Python's reflected
    # operators exactly — ``1.0 / col`` keeps the Double literal first
    # (``1.0D /``), ``_RTOL * F.abs(x)`` reflected to ``abs(x) * rtol``,
    # ``_ATOL + y`` reflected to ``y + atol`` — so the parsed trees are
    # node-identical to the former Column build (pinned by the
    # plan-identity test).
    lagf = "lag(frequency) OVER (PARTITION BY series_id ORDER BY frequency)"
    diffs = pg.selectExpr(
        "series_id",
        "frequency",
        "power",
        f"frequency - {lagf} AS df_i",
        f"(1.0D / frequency) - (1.0D / {lagf}) AS dp_i",
    )
    # the medians ride the SAME series_id exchange+sort the lag window
    # already paid (unbounded-frame window aggregates, not a separate
    # groupBy + join back — that shape cost an extra shuffle, a broadcast,
    # and a full second pass over the periodogram; measured 1.9× slower at
    # sf0.1)
    enr = diffs.selectExpr(
        "*",
        "median(df_i) OVER (PARTITION BY series_id) AS median_df",
        "-median(dp_i) OVER (PARTITION BY series_id) AS median_dp",
    )
    agg = (
        enr
        .groupBy("series_id")
        .agg(
            F.expr("max_by(frequency, power) AS fmax"),
            F.expr("max_by(1.0D / frequency, power) AS pmax"),
            F.expr("first(median_df) AS median_df"),
            F.expr("first(median_dp) AS median_dp"),
            F.expr(
                "min(CASE WHEN df_i IS NULL THEN true ELSE"
                f" abs(df_i - median_df) <= abs(median_df) * {_RTOL!r}D"
                f" + {_ATOL!r}D END) AS is_uniform_f"
            ),
        )
    )
    return agg.selectExpr(
        "*", "CASE WHEN is_uniform_f THEN median_df END AS df"
    )
