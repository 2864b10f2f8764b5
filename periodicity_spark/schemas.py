"""Fixed long-format schemas mirroring the reference's three array kinds.

The reference routes results by dimension set (``_replace_data_and_dims``,
reference core.py:128-142): reducing over ``time`` yields a frequency-indexed
result and vice versa.  We mirror that with three fixed StructTypes and the
same routing rule (see ``reduce_dims`` helpers in operators/agg.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

TS_SCHEMA = T.StructType(
    [
        T.StructField("series_id", T.StringType(), False),
        T.StructField("time", T.DoubleType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)

TS_SCHEMA_DY = T.StructType(TS_SCHEMA.fields + [T.StructField("dy", T.DoubleType(), True)])

PG_SCHEMA = T.StructType(
    [
        T.StructField("series_id", T.StringType(), False),
        T.StructField("frequency", T.DoubleType(), False),
        T.StructField("power", T.DoubleType(), True),
    ]
)

TF_SCHEMA = T.StructType(
    [
        T.StructField("series_id", T.StringType(), False),
        T.StructField("time", T.DoubleType(), False),
        T.StructField("frequency", T.DoubleType(), False),
        T.StructField("power", T.DoubleType(), True),
    ]
)

MODES_SCHEMA = T.StructType(
    [
        T.StructField("series_id", T.StringType(), False),
        T.StructField("mode", T.IntegerType(), False),
        T.StructField("time", T.DoubleType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)


def validate_ts(df: DataFrame) -> DataFrame:
    """Check a DataFrame carries at least the ts columns with numeric types.

    Mirrors the reference ctor validation (core.py:461-477) minus the eager
    sort: sortedness is a logical invariant enforced by Window.orderBy in
    every order-sensitive operator, never a physical one.
    """
    cols = set(df.columns)
    missing = {"series_id", "time", "value"} - cols
    if missing:
        raise ValueError(f"ts DataFrame missing columns: {sorted(missing)}")
    return df
