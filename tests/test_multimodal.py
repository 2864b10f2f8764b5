"""Multimodal decode tests: real WAV/BMP/Y4M parsers (stdlib-only), negative
paths, and the Spark mapInPandas plumbing."""

import math

import numpy as np
import pandas as pd
import pytest

from periodicity_spark.pipeline.multimodal import (
    decode_bmp,
    decode_wav,
    decode_y4m,
    extract_features,
    frame_sample_plan,
    make_bmp,
    make_wav,
    make_y4m,
    synthesize_media,
)


def test_decode_wav_exact():
    f, n, sr, amp = 440.0, 800, 8000, 0.5
    feats = decode_wav(make_wav(f, n=n, sample_rate=sr, amp=amp))
    n_samples, rate, channels, duration, rms, peak, zcr, mean = feats
    assert n_samples == n and rate == sr and channels == 1
    assert duration == pytest.approx(n / sr)
    assert rms == pytest.approx(amp / math.sqrt(2), rel=0.01)
    assert peak == pytest.approx(amp, rel=0.01)
    # sine at f crosses zero 2f times per second
    assert zcr == pytest.approx(2 * f / sr, rel=0.05)
    assert abs(mean) < 0.01


def test_decode_wav_negative_paths():
    assert decode_wav(None) is None
    assert decode_wav(b"") is None
    assert decode_wav(b"not audio at all, just text" * 10) is None
    wav = make_wav(440.0)
    assert decode_wav(wav[:30]) is None            # truncated header
    assert decode_wav(b"RIFF" + wav[4:8] + b"AVI " + wav[12:]) is None  # wrong form


def test_decode_bmp_exact():
    feats = decode_bmp(make_bmp(5, 3, rgb=(200, 100, 50)))
    w, h, r, g, b, luma, std_luma, aspect = feats
    assert (w, h) == (5.0, 3.0)
    assert (r, g, b) == (200.0, 100.0, 50.0)
    assert std_luma == pytest.approx(0.0, abs=1e-9)  # solid color
    assert luma == pytest.approx(0.299 * 200 + 0.587 * 100 + 0.114 * 50)
    assert aspect == pytest.approx(5 / 3)
    # width not a multiple of 4 exercises row padding; 4-wide has none
    assert decode_bmp(make_bmp(4, 2, rgb=(1, 2, 3)))[:2] == [4.0, 2.0]


def test_decode_bmp_negative_paths():
    assert decode_bmp(None) is None
    assert decode_bmp(b"") is None
    assert decode_bmp(b"BM" + b"\x00" * 20) is None        # truncated
    assert decode_bmp(make_wav(100.0)) is None             # wrong format
    bmp = make_bmp(4, 4, rgb=(9, 9, 9))
    assert decode_bmp(bmp[: len(bmp) - 10]) is None        # truncated pixels


def test_decode_y4m_exact():
    feats = decode_y4m(make_y4m(16, 8, n_frames=3, fps=(30, 1), luma=[10, 50, 90]))
    w, h, nfr, fps, mean_luma, std_luma, diff, duration = feats
    assert (w, h, nfr, fps) == (16.0, 8.0, 3.0, 30.0)
    assert mean_luma == pytest.approx((10 + 50 + 90) / 3)
    # solid frames: per-pixel std equals the std of the 3 frame values
    assert std_luma == pytest.approx(np.std([10, 50, 90]))
    assert diff == pytest.approx(40.0)  # constant +40 luma step per frame
    assert duration == pytest.approx(3 / 30)
    # single frame → zero motion, duration 1/fps
    one = decode_y4m(make_y4m(8, 6, n_frames=1, luma=[77]))
    assert one[2] == 1.0 and one[6] == 0.0 and one[4] == 77.0


def test_decode_y4m_negative_paths():
    assert decode_y4m(None) is None
    assert decode_y4m(b"") is None
    assert decode_y4m(b"not video") is None
    assert decode_y4m(make_wav(100.0)) is None                # wrong format
    clip = make_y4m(8, 6, n_frames=2)
    assert decode_y4m(clip[: len(clip) - 5]) is None          # truncated frame
    assert decode_y4m(clip.replace(b"C420jpeg", b"C444\x20\x20\x20\x20")) is None  # unsupported subsampling
    assert decode_y4m(b"YUV4MPEG2 W0 H6 F25:1\n") is None     # bad dims
    # header only, zero frames
    assert decode_y4m(b"YUV4MPEG2 W8 H6 F25:1\n") is None


def test_extract_features_spark(spark):
    ids = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1, 2, 3, 4, 5, 6],
                "kind": ["audio", "image", "video", "audio", "image", "video"],
            }
        )
    )
    media = synthesize_media(ids)
    out = extract_features(media).orderBy("media_id").collect()
    assert len(out) == 6
    by_id = {r.media_id: r for r in out}
    # audio: real decode — 256 samples at 8 kHz
    assert by_id[1].features[0] == 256.0 and by_id[1].features[1] == 8000.0
    # image: real decode — dims keyed by media_id (w=4+id%5, h=3+id%4)
    assert by_id[2].features[0] == 6.0 and by_id[2].features[1] == 5.0
    # video: real Y4M decode — dims keyed by media_id (w=8+2*(id%4),
    # h=6+2*(id%3)), 25 fps
    assert by_id[3].features[0] == 14.0 and by_id[3].features[1] == 6.0
    assert by_id[3].features[3] == 25.0
    assert len(by_id[3].features) == 8
    # cross-check against the local decoders (same payload bytes)
    pay = {r.media_id: r.payload for r in media.collect()}
    np.testing.assert_allclose(by_id[4].features, decode_wav(bytes(pay[4])))
    np.testing.assert_allclose(by_id[5].features, decode_bmp(bytes(pay[5])))


def test_extract_features_malformed_payload_is_null(spark):
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1, 2],
                "kind": ["audio", "image"],
                "payload": [b"garbage", b"also garbage"],
                "meta": [{}, {}],
            }
        ),
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    out = extract_features(media).orderBy("media_id").collect()
    assert all(r.features is None for r in out)


def test_frame_sample_plan(spark):
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1, 2],
                "kind": ["video", "audio"],
                "payload": [b"x", b"y"],
                "meta": [{"n_frames": "25"}, {}],
            }
        ),
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    rows = frame_sample_plan(media, every_n=10).collect()
    assert [(r.media_id, r.frame_index) for r in rows] == [(1, 0), (1, 10), (1, 20)]


def test_box_resize_gradient_matches_block_means():
    import numpy as np

    from periodicity_spark.pipeline.multimodal import box_resize

    a = np.arange(12 * 16, dtype=float).reshape(12, 16)
    out = box_resize(a, 3, 4)
    # 12x16 -> 3x4 divides evenly: each cell is the mean of a 4x4 block
    want = a.reshape(3, 4, 4, 4).transpose(0, 2, 1, 3).reshape(3, 4, 16).mean(axis=2)
    assert np.allclose(out, want, rtol=0, atol=1e-9)
    # upscale degenerates to nearest pixel, no div-by-zero
    up = box_resize(np.array([[1.0, 2.0], [3.0, 4.0]]), 4, 4)
    assert up.shape == (4, 4) and up[0, 0] == 1.0 and up[3, 3] == 4.0


def test_resize_images_real_bmp_two_tone(spark):
    """A half-black / half-white 24-bpp BMP resized 2x2: left column black,
    right column white — proves real pixel decode + area averaging, not just
    the solid-color oracle case."""
    import struct

    import numpy as np

    w, h = 8, 4
    stride = ((w * 3 + 3) // 4) * 4
    row = bytes([0, 0, 0] * (w // 2) + [255, 255, 255] * (w // 2))
    row += b"\x00" * (stride - w * 3)
    pixels = row * h
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    payload = (
        b"BM" + struct.pack("<IHHI", 14 + len(dib) + len(pixels), 0, 0, 14 + len(dib))
        + dib + pixels
    )
    media = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [7], "kind": ["image"], "payload": [payload], "meta": [{}]}
        ),
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    from periodicity_spark.pipeline.multimodal import resize_images

    out = resize_images(media, out_w=2, out_h=2).toPandas()
    assert len(out) == 4 and set(out.width) == {8} and set(out.height) == {4}
    grid = out.sort_values(["py", "px"]).luma.to_numpy().reshape(2, 2)
    assert np.allclose(grid[:, 0], 0.0) and np.allclose(grid[:, 1], 255.0)


def test_sample_frames_real_y4m_stride(spark):
    from periodicity_spark.pipeline.multimodal import make_y4m, sample_frames

    payload = make_y4m(8, 6, n_frames=5, luma=[10, 60, 110, 160, 210])
    media = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [3], "kind": ["video"], "payload": [payload], "meta": [{}]}
        ),
        "media_id long, kind string, payload binary, meta map<string,string>",
    )
    rows = sample_frames(media, stride=2).orderBy("frame_index").collect()
    assert [(r.frame_index, r.mean_luma, r.std_luma) for r in rows] == [
        (0, 10.0, 0.0), (2, 110.0, 0.0), (4, 210.0, 0.0)
    ]
    assert rows[1].t_sec == 2 / 25.0


def test_audio_features_recover_tone_frequency(spark):
    """Spectral centroid of a synthesized pure tone lands on the tone
    frequency (within FFT bin resolution); flatness is near 0 for a tone;
    malformed and non-audio payloads yield NULL features."""
    from periodicity_spark.pipeline.multimodal import audio_features, make_wav

    rows = [
        (1, "audio", make_wav(400.0, n=1024, sample_rate=8000), None),
        (2, "audio", make_wav(1200.0, n=1024, sample_rate=8000), None),
        (3, "audio", b"not a wav", None),
        (4, "video", b"whatever", None),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, meta map<string,string>"
    )
    out = audio_features(media).toPandas().set_index("media_id")
    res = 8000.0 / 1024  # FFT bin width
    assert abs(out.loc[1, "centroid_hz"] - 400.0) < 3 * res
    assert abs(out.loc[2, "centroid_hz"] - 1200.0) < 3 * res
    assert out.loc[1, "flatness"] < 0.1
    assert out.loc[1, "rolloff85_hz"] >= out.loc[1, "centroid_hz"] - 3 * res
    assert pd.isna(out.loc[3, "centroid_hz"]) and pd.isna(out.loc[4, "rms"])


def test_image_dhash_near_duplicates(spark):
    """dHash blocking finds the perturbed twin of a gradient image at a
    small Hamming distance and does NOT pair it with a reversed gradient;
    the banded join never compares all pairs."""
    from periodicity_spark.pipeline.multimodal import (
        image_dhash,
        image_near_duplicates,
        make_bmp_from_array,
    )

    base = np.zeros((16, 18, 3), dtype=np.uint8)
    for x in range(18):
        base[:, x, :] = int(x * 255 / 17)
    twin = base.copy()
    twin[3, 4, :] = 255  # one bright pixel
    reverse = base[:, ::-1, :].copy()
    flat = np.full((16, 18, 3), 128, dtype=np.uint8)
    rows = [
        (1, "image", make_bmp_from_array(base), None),
        (2, "image", make_bmp_from_array(twin), None),
        (3, "image", make_bmp_from_array(reverse), None),
        (4, "image", make_bmp_from_array(flat), None),
        (5, "audio", b"skip me", None),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, meta map<string,string>"
    )
    h = image_dhash(media).toPandas().set_index("media_id")["dhash"]
    assert set(h.index) == {1, 2, 3, 4}
    # gradient hashes: all left>right bits false for ascending gradient
    assert h[1] != h[3]  # reversed gradient differs
    pairs = image_near_duplicates(media, max_hamming=6).toPandas()
    got = {tuple(sorted((r.m1, r.m2))) for r in pairs.itertuples()}
    assert (1, 2) in got, pairs.to_string()
    assert (1, 3) not in got
    ham12 = pairs.set_index(["m1", "m2"]).loc[(1, 2), "hamming"]
    assert 0 < int(ham12) <= 6


def test_sample_frames_by_motion_keeps_scene_changes(spark):
    """A clip with luma plateaus [10×4, 200×3, 205×2] keeps frame 0 and the
    one real scene change; the small 200→205 drift stays below threshold.
    Reference point against the previous EMITTED frame (not the previous
    frame) so slow drifts cannot evade the threshold forever."""
    from periodicity_spark.pipeline.multimodal import (
        make_y4m,
        sample_frames_by_motion,
    )

    luma = [10, 10, 10, 10, 200, 200, 200, 205, 205]
    rows = [
        (1, "video", make_y4m(8, 6, n_frames=9, luma=luma), None),
        (2, "audio", b"skip", None),
        (3, "video", b"corrupt", None),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, meta map<string,string>"
    )
    out = (
        sample_frames_by_motion(media, threshold=8.0)
        .toPandas()
        .sort_values("frame_index")
    )
    assert out["media_id"].unique().tolist() == [1]
    assert out["frame_index"].tolist() == [0, 4]
    assert pd.isna(out.iloc[0]["motion"]) and out.iloc[1]["motion"] == 190.0
