"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

Decode status (honest accounting):

- ``audio`` — REAL decode: RIFF/WAVE PCM parser (stdlib ``struct`` +
  numpy.frombuffer; 8/16/32-bit PCM, any channel count) → duration, sample
  rate, amplitude stats, zero-crossing rate.
- ``image`` — REAL decode: uncompressed 24-bpp BMP parser (BITMAPFILEHEADER
  + BITMAPINFOHEADER, bottom-up rows, 4-byte row padding) → dimensions,
  per-channel means, luma stats.
- ``video`` — STUB: no container/codec lib in this image; a clearly-marked
  deterministic byte-histogram fake keeps the plumbing testable. Swap for
  ffmpeg in production.

Malformed payloads decode to NULL features (the negative path), never throw.
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

N_FEATURES = 8


def decode_wav(payload: bytes) -> list[float] | None:
    """RIFF/WAVE PCM → [n_samples, sample_rate, channels, duration_s, rms,
    peak, zcr, mean] (amplitude normalized to full scale). None if the
    payload is not a well-formed PCM WAV."""
    import struct

    import numpy as np

    try:
        if payload is None or len(payload) < 44:
            return None
        if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
            return None
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos:pos + 4]
            (csize,) = struct.unpack_from("<I", payload, pos + 4)
            body = payload[pos + 8:pos + 8 + csize]
            if cid == b"fmt " and len(body) >= 16:
                fmt = struct.unpack_from("<HHIIHH", body, 0)
            elif cid == b"data":
                data = body
            pos += 8 + csize + (csize & 1)  # chunks are word-aligned
        if fmt is None or data is None:
            return None
        audio_format, channels, sample_rate, _rate, _align, bits = fmt
        if audio_format != 1 or channels < 1 or sample_rate <= 0:
            return None  # PCM only
        if bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(float) / 32768.0
        elif bits == 8:
            x = (np.frombuffer(data, dtype="u1").astype(float) - 128.0) / 128.0
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(float) / 2147483648.0
        else:
            return None
        n_frames = len(x) // channels
        if n_frames == 0:
            return None
        x = x[: n_frames * channels].reshape(n_frames, channels).mean(axis=1)
        zc = float(np.count_nonzero(np.diff(np.signbit(x)))) / max(n_frames - 1, 1)
        return [
            float(n_frames),
            float(sample_rate),
            float(channels),
            n_frames / sample_rate,
            float(np.sqrt(np.mean(x * x))),
            float(np.abs(x).max()),
            zc,
            float(x.mean()),
        ]
    except Exception:
        return None


def decode_bmp(payload: bytes) -> list[float] | None:
    """Uncompressed 24-bpp BMP → [width, height, mean_r, mean_g, mean_b,
    mean_luma, std_luma, aspect]. None if not a well-formed 24-bpp BMP."""
    import struct

    import numpy as np

    try:
        if payload is None or len(payload) < 54 or payload[0:2] != b"BM":
            return None
        (pix_off,) = struct.unpack_from("<I", payload, 10)
        (hdr_size,) = struct.unpack_from("<I", payload, 14)
        if hdr_size < 40:
            return None
        width, height = struct.unpack_from("<ii", payload, 18)
        (bpp,) = struct.unpack_from("<H", payload, 28)
        (compression,) = struct.unpack_from("<I", payload, 30)
        if bpp != 24 or compression != 0 or width <= 0 or height == 0:
            return None
        flipped = height < 0  # negative height = top-down rows
        h = abs(height)
        stride = ((width * 3 + 3) // 4) * 4
        need = pix_off + stride * h
        if len(payload) < need:
            return None
        rows = np.frombuffer(payload, dtype="u1", count=stride * h, offset=pix_off)
        rows = rows.reshape(h, stride)[:, : width * 3].reshape(h, width, 3)
        if not flipped:
            rows = rows[::-1]  # bottom-up storage → top-down
        bgr = rows.astype(float)
        b, g, r = bgr[..., 0], bgr[..., 1], bgr[..., 2]
        luma = 0.299 * r + 0.587 * g + 0.114 * b
        return [
            float(width),
            float(h),
            float(r.mean()),
            float(g.mean()),
            float(b.mean()),
            float(luma.mean()),
            float(luma.std()),
            float(width) / float(h),
        ]
    except Exception:
        return None


def _fake_decode(payload: bytes, n_features: int = N_FEATURES) -> list[float] | None:
    """STUB (video only): deterministic byte-histogram moments — no codec lib
    in this image. Stable across runs/executors; swap for a real demuxer in
    production."""
    if payload is None or len(payload) == 0:
        return None
    acc = [0.0] * n_features
    for i, b in enumerate(payload):
        acc[i % n_features] += b / 255.0
    return [x / max(len(payload), 1) for x in acc]


DECODERS: dict[str, Callable[[bytes], list[float] | None]] = {
    "image": decode_bmp,   # real
    "audio": decode_wav,   # real
    "video": _fake_decode,  # stub
}


def extract_features(media: DataFrame, n_features: int = N_FEATURES) -> DataFrame:
    """binary payload → feature vector, Arrow-batched via mapInPandas.
    → (media_id, kind, features array<double>). Partition-friendly: each
    batch decodes independently; no state, no driver round-trips; malformed
    payloads (and unknown kinds) yield NULL features."""
    from periodicity_spark.session import ensure_worker_imports

    ensure_worker_imports(media.sparkSession)
    nf = n_features

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd
        from periodicity_spark.pipeline.multimodal import DECODERS as reg

        for pdf in it:
            feats = []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                dec = reg.get(kind)
                out = dec(payload) if dec is not None else None
                if out is not None and len(out) != nf:
                    out = (out + [0.0] * nf)[:nf]
                feats.append(out)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "features": feats}
            )

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType()), True),
        ]
    )
    return media.mapInPandas(_batches, out_schema)


def synthesize_media(ids: DataFrame) -> DataFrame:
    """Deterministic media fixture generator: (media_id, kind) → MEDIA_SCHEMA
    rows with REAL format payloads — a PCM16 sine WAV for audio (frequency
    keyed by media_id), a solid-color 24-bpp BMP for image (color keyed by
    media_id), raw id-derived bytes for video (the stub path). Exists so
    decode tests and the contract query exercise genuine parsers without
    shipping binary fixtures."""
    from periodicity_spark.session import ensure_worker_imports

    ensure_worker_imports(ids.sparkSession)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd
        from periodicity_spark.pipeline.multimodal import make_bmp, make_wav

        for pdf in it:
            rows = []
            for mid, kind in zip(pdf["media_id"], pdf["kind"]):
                mid = int(mid)
                if kind == "audio":
                    payload = make_wav(
                        freq_hz=200.0 + (mid % 20) * 50.0, n=256, sample_rate=8000
                    )
                    meta = {"codec": "pcm16"}
                elif kind == "image":
                    w, h = 4 + mid % 5, 3 + mid % 4
                    payload = make_bmp(w, h, rgb=(mid % 256, (mid * 7) % 256, (mid * 13) % 256))
                    meta = {"format": "bmp24"}
                else:
                    payload = bytes([(mid * 31 + i) % 256 for i in range(64)])
                    meta = {"n_frames": str(mid % 100)}
                rows.append((mid, kind, payload, meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])

    return ids.mapInPandas(_batches, MEDIA_SCHEMA)


def make_wav(freq_hz: float, n: int = 256, sample_rate: int = 8000, amp: float = 0.5) -> bytes:
    """Minimal valid PCM16 mono WAV of a sine tone (fixture helper)."""
    import math
    import struct

    samples = [
        int(amp * 32767 * math.sin(2 * math.pi * freq_hz * i / sample_rate))
        for i in range(n)
    ]
    data = struct.pack(f"<{n}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_bmp(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Minimal valid solid-color 24-bpp bottom-up BMP (fixture helper)."""
    import struct

    stride = ((width * 3 + 3) // 4) * 4
    row = bytes([rgb[2], rgb[1], rgb[0]] * width) + b"\x00" * (stride - width * 3)
    pixels = row * height
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    header = b"BM" + struct.pack("<IHHI", 14 + len(dib) + len(pixels), 0, 0, 14 + len(dib))
    return header + dib + pixels


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
