"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The decode step is STUBBED (no image/audio libs in this container) behind
``DECODERS`` — a deterministic fake produces stable feature vectors so the
Spark-side plumbing (schema, batching, partition sizing) is real and tested.
Swap the fake for a real decoder (PIL/torchaudio/ffmpeg) in production.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def _fake_decode(payload: bytes, n_features: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: byte-histogram moments.
    Stable across runs/executors; replace with a real decode in production."""
    if payload is None or len(payload) == 0:
        return [0.0] * n_features
    acc = [0.0] * n_features
    for i, b in enumerate(payload):
        acc[i % n_features] += b / 255.0
    return [x / max(len(payload), 1) for x in acc]


DECODERS: dict[str, Callable[[bytes], list[float]]] = {
    "image": _fake_decode,
    "audio": _fake_decode,
    "video": _fake_decode,
}


def extract_features(media: DataFrame, n_features: int = 8) -> DataFrame:
    """binary payload → feature vector, Arrow-batched via mapInPandas.
    → (media_id, kind, features array<double>). Partition-friendly: each
    batch decodes independently; no state, no driver round-trips."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType()), True),
        ]
    )
    known_kinds = frozenset(DECODERS)

    # self-contained closure (no module-global references): cloudpickle ships
    # it by value, so executors never need periodicity_spark on PYTHONPATH.
    # The real decoder registry can't ship this way (C libs) — production
    # swaps the inline fake for a worker-side import of the decode package.
    def _batches(it):
        import pandas as pd

        def fake_decode(payload, k=n_features):
            if payload is None or len(payload) == 0:
                return [0.0] * k
            acc = [0.0] * k
            for i, b in enumerate(payload):
                acc[i % k] += b / 255.0
            return [x / max(len(payload), 1) for x in acc]

        for pdf in it:
            feats = [
                fake_decode(payload) if kind in known_kinds else None
                for kind, payload in zip(pdf["kind"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    return media.mapInPandas(_batches, out_schema)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one row per sampled frame index, derived
    from meta['n_frames'] — pure plan math (sequence+explode), decode stubbed.
    → (media_id, frame_index)."""
    n_frames = F.coalesce(
        F.element_at(F.col("meta"), "n_frames").cast("int"), F.lit(0)
    )
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
            ).alias("frame_index"),
        )
    )
