from periodicity_spark.sources.ingest import load_table, ts_from_events, ts_from_parquet

__all__ = ["load_table", "ts_from_events", "ts_from_parquet"]
