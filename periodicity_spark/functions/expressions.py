"""Reusable Column / Window expression builders (SURVEY.md §2.5 patterns).

The reference maintains a physical sort invariant at construction
(core.py:473-477); here sortedness is logical — every order-sensitive
operator uses Window.partitionBy("series_id").orderBy("time"), which Catalyst
turns into at most one SortExec per stage and reuses across chained window
functions over the same (partition, order) spec.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F

def series_window() -> WindowSpec:
    """Window.partitionBy("series_id").orderBy("time") — built lazily because
    PySpark 4 WindowSpec construction needs an active session."""
    return Window.partitionBy("series_id").orderBy("time")


def w_series(order_col: str = "time", *extra_part: str) -> WindowSpec:
    return Window.partitionBy("series_id", *extra_part).orderBy(order_col)


def fold_expr(time: Column | str = "time", period: Column | float = 1.0, t0: Column | float = 0.0) -> Column:
    """Phase fold: ((time − t0) / period) mod 1 (reference core.py:543-544).

    F.pmod is not exposed in the Python API as of 4.x under that name for
    doubles portably; ((x % 1) + 1) % 1 gives the positive modulus like numpy.
    """
    t = F.col(time) if isinstance(time, str) else time
    p = F.lit(period) if isinstance(period, (int, float)) else period
    z = F.lit(t0) if isinstance(t0, (int, float)) else t0
    frac = (t - z) / p
    return ((frac % 1) + 1) % 1


def time_bucket(time: Column | str, t_origin: Column, dt: float) -> Column:
    """Tumbling-bin index floor((time − origin)/dt) — downsample's grouping key
    (reference core.py:629-634 uses xarray groupby_bins on the same grid)."""
    t = F.col(time) if isinstance(time, str) else time
    return F.floor((t - t_origin) / F.lit(dt)).cast("long")


def sessionize(gap: Column | float, time: str = "time", extra_part: tuple[str, ...] = ()) -> Column:
    """Segment id per series: cumulative count of gaps > ``gap``
    (reference split(), core.py:619-627). 0-based like the reference's list index."""
    g = F.lit(gap) if isinstance(gap, (int, float)) else gap
    w = Window.partitionBy("series_id", *extra_part).orderBy(time)
    prev_t = F.lag(time).over(w)
    is_break = F.when(prev_t.isNotNull() & ((F.col(time) - prev_t) > g), 1).otherwise(0)
    return F.sum(is_break).over(w.rowsBetween(Window.unboundedPreceding, 0))


def ffill(col: str = "value", time: str = "time") -> Column:
    """Last non-null preceding value (reference interpolate_na 'ffill',
    core.py:664-701)."""
    w = series_window().rowsBetween(Window.unboundedPreceding, 0)
    return F.last(col, ignorenulls=True).over(w)


def bfill(col: str = "value", time: str = "time") -> Column:
    w = series_window().rowsBetween(0, Window.unboundedFollowing)
    return F.first(col, ignorenulls=True).over(w)


def derivative(value: str = "value", time: str = "time") -> Column:
    """Centered finite difference d(value)/d(time) with one-sided edges
    (reference core.py:524-526, xarray differentiate semantics).

    try_divide, not /: DUPLICATE TIMESTAMPS make the denominator 0 and an
    ANSI division aborts the whole stage for one bad row — the derivative
    at a zero-dt neighbor pair is undefined and becomes NULL (the
    reference's NumPy path emits ±inf there; NULL is this engine's
    NaN/undefined convention)."""
    w = series_window()
    v_prev, v_next = F.lag(value).over(w), F.lead(value).over(w)
    t_prev, t_next = F.lag(time).over(w), F.lead(time).over(w)
    v, t = F.col(value), F.col(time)
    centered = F.try_divide(v_next - v_prev, t_next - t_prev)
    fwd = F.try_divide(v_next - v, t_next - t)
    bwd = F.try_divide(v - v_prev, t - t_prev)
    return F.when(t_prev.isNull(), fwd).when(t_next.isNull(), bwd).otherwise(centered)


def is_peak_candidate(value: str = "value", include_edges: bool = False) -> Column:
    """Strictly-greater-than-left, ≥-right local maximum candidate — matches
    scipy find_peaks' plateau-left-edge convention used by the reference
    (core.py:283-317). Edges excluded unless include_edges."""
    w = series_window()
    v = F.col(value)
    v_prev, v_next = F.lag(value).over(w), F.lead(value).over(w)
    interior = (v > v_prev) & (v > v_next)
    if include_edges:
        left_edge = v_prev.isNull() & (v > v_next)
        right_edge = v_next.isNull() & (v > v_prev)
        return F.coalesce(interior, F.lit(False)) | F.coalesce(left_edge, F.lit(False)) | F.coalesce(
            right_edge, F.lit(False)
        )
    return v_prev.isNotNull() & v_next.isNotNull() & interior


def zero_crossing_flag(value: str = "value") -> Column:
    """True where sign(value) differs from the previous row's sign
    (reference find_zero_crossings, core.py:341-367)."""
    w = series_window()
    s = F.signum(F.col(value))
    s_prev = F.lag(s).over(w)
    return s_prev.isNotNull() & (s != s_prev)
