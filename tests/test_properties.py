"""Property-based tests (hypothesis) for the pure numeric kernels — the
pieces every Spark operator leans on. Kernel-level so each example runs in
microseconds; the Spark plumbing above them is covered by the oracle queries.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from periodicity_spark.decomposition.kernels import cubic_spline, emd, find_extrema_idx
from periodicity_spark.gp.celerite import brownian_coeffs, celerite_nll
from periodicity_spark.pipeline.multimodal import (
    decode_bmp,
    decode_wav,
    make_bmp,
    make_wav,
)


@st.composite
def _series(draw, min_n=8, max_n=64):
    n = draw(st.integers(min_n, max_n))
    dts = draw(
        st.lists(st.floats(0.05, 2.0, allow_nan=False), min_size=n, max_size=n)
    )
    t = np.cumsum(np.asarray(dts))
    y = np.asarray(
        draw(st.lists(st.floats(-50, 50, allow_nan=False), min_size=n, max_size=n))
    )
    return t, y


@given(_series())
@settings(max_examples=60, deadline=None)
def test_spline_interpolates_through_knots(s):
    t, y = s
    out = cubic_spline(t, y, t)
    assert np.allclose(out, y, rtol=0, atol=1e-6 * max(1.0, np.abs(y).max()))


@given(_series(), st.floats(-3, 3, allow_nan=False), st.floats(-10, 10, allow_nan=False))
@settings(max_examples=60, deadline=None)
def test_spline_reproduces_linear_functions(s, a, b):
    # a not-a-knot spline through samples of a line IS that line, including
    # extrapolation beyond the knots
    t, _ = s
    y = a * t + b
    x = np.linspace(t[0] - 1.0, t[-1] + 1.0, 40)
    out = cubic_spline(t, y, x)
    assert np.allclose(out, a * x + b, rtol=1e-7, atol=1e-6 * max(1.0, abs(b) + 3 * np.abs(t).max()))


@given(_series(min_n=16, max_n=80))
@settings(max_examples=40, deadline=None)
def test_emd_reconstruction_identity(s):
    # EMD is a decomposition: sum of modes + residue == input, exactly
    # (each sift subtracts what it extracts)
    t, y = s
    modes, residue = emd(t, y)
    recon = residue + (np.sum(modes, axis=0) if modes else 0.0)
    assert np.allclose(recon, y, rtol=0, atol=1e-9 * max(1.0, np.abs(y).max()))


@given(_series(min_n=10, max_n=40))
@settings(max_examples=40, deadline=None)
def test_extrema_are_strict_local_extrema(s):
    _, y = s
    peaks, dips = find_extrema_idx(y)
    for p in peaks:
        assert 0 < p < len(y) - 1 and y[p] > y[p - 1] and y[p] > y[p + 1]
    for d in dips:
        assert 0 < d < len(y) - 1 and y[d] < y[d - 1] and y[d] < y[d + 1]


@given(
    _series(min_n=8, max_n=40),
    st.floats(0.1, 5.0, allow_nan=False),
    st.floats(0.5, 40.0, allow_nan=False),
    st.floats(1.0, 20.0, allow_nan=False),
    st.floats(0.05, 0.95, allow_nan=False),
)
@settings(max_examples=40, deadline=None)
def test_celerite_nll_matches_dense(s, sigma, tau, period, mix):
    # the O(N) semiseparable NLL must equal the O(N^3) dense Cholesky NLL
    # for every valid kernel/input — not just the fixed differential cases
    import math

    t, y = s
    y = y / max(1.0, np.abs(y).max())
    diag = np.full(len(t), 0.1)
    k = brownian_coeffs(sigma=sigma, tau=tau, period=period, mix=mix)
    a = celerite_nll(t, y, diag, k, 0.0)
    K = k.value(np.abs(t[:, None] - t[None, :]))
    K[np.diag_indices_from(K)] = k.variance + diag
    L = np.linalg.cholesky(K)
    alpha = np.linalg.solve(L, y)
    b = (
        0.5 * (alpha @ alpha)
        + np.sum(np.log(np.diag(L)))
        + 0.5 * len(y) * math.log(2 * math.pi)
    )
    assert np.isfinite(a) and abs(a - b) <= 1e-6 * max(1.0, abs(b))


@given(
    st.floats(50, 3000, allow_nan=False),
    st.integers(16, 512),
    st.sampled_from([4000, 8000, 16000, 44100]),
)
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip(freq, n, rate):
    f = decode_wav(make_wav(freq_hz=freq, n=n, sample_rate=rate))
    assert f is not None
    n_frames, sr, ch, dur = f[0], f[1], f[2], f[3]
    assert (n_frames, sr, ch) == (n, rate, 1)
    assert abs(dur - n / rate) < 1e-12


@given(
    st.integers(1, 40),
    st.integers(1, 40),
    st.tuples(st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)),
)
@settings(max_examples=40, deadline=None)
def test_bmp_roundtrip(w, h, rgb):
    f = decode_bmp(make_bmp(w, h, rgb))
    assert f is not None
    assert (f[0], f[1]) == (w, h)
    assert (round(f[2]), round(f[3]), round(f[4])) == rgb  # solid color means
    assert f[6] < 1e-9  # ~zero luma std for a solid image (mean rounding)


@given(st.binary(max_size=200))
@settings(max_examples=60, deadline=None)
def test_decoders_never_crash_on_garbage(payload):
    # malformed payloads yield None, never exceptions (executor safety)
    assert decode_wav(payload) is None or isinstance(decode_wav(payload), list)
    assert decode_bmp(payload) is None or isinstance(decode_bmp(payload), list)
