from periodicity_spark.streaming.ops import (
    events_stream,
    stream_dedup,
    stream_downsample,
    stream_ffill,
    stream_funnel,
    stream_neardup,
    stream_sessionize,
    stream_slide,
    stream_topk,
    stream_zscore,
)

__all__ = [
    "events_stream",
    "stream_dedup",
    "stream_downsample",
    "stream_ffill",
    "stream_funnel",
    "stream_neardup",
    "stream_sessionize",
    "stream_slide",
    "stream_topk",
    "stream_zscore",
]
