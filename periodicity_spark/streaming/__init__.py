from periodicity_spark.streaming.ops import (
    events_stream,
    stream_dedup,
    stream_zscore,
    stream_downsample,
    stream_ffill,
    stream_sessionize,
)

__all__ = ["events_stream", "stream_dedup", "stream_downsample", "stream_sessionize", "stream_ffill", "stream_zscore"]
