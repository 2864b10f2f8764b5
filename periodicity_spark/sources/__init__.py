from periodicity_spark.sources.ingest import load_table, ts_from_events, ts_from_parquet
from periodicity_spark.sources.sink import (
    read_series_store,
    ts_from_csv,
    write_series_store,
)

__all__ = [
    "load_table",
    "ts_from_events",
    "ts_from_parquet",
    "ts_from_csv",
    "write_series_store",
    "read_series_store",
]
