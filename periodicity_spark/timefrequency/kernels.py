"""NumPy kernels for time-frequency operators (no pywt/scipy in this image).

- Morlet CWT: FFT-convolution implementation of the complex Morlet
  ('cmor B-C' family: ψ(t) = (πB)^(-1/2)·exp(−t²/B)·exp(2πiCt), so
  ψ̂(f) = exp(−π²B(f−C)²)) following the standard Torrence & Compo (1998)
  formulation; matches the reference's wavelet family choice
  (timefrequency.py:208: cmor2.0-1.0) up to a constant amplitude factor.
- Hilbert transform via the one-sided FFT spectrum doubler (the textbook
  construction scipy.signal.hilbert implements).
- Periodized db4 DWT for wavelet-shrinkage denoising (reference
  timefrequency.py:151-159): soft-threshold σ√(2 ln N).
"""

from __future__ import annotations

import numpy as np

# Orthogonal-wavelet decomposition low-pass filters, in dec_lo order
# (public constants from the Daubechies/Symlet literature — the same
# values pywt ships; the reference forwards its wavelet= kwarg to pywt,
# timefrequency.py:151-159). Every entry is validated by the QMF
# property tests (Σh = √2, Σh² = 1, even-shift orthonormality) in
# tests/test_timefrequency.py — a transcription error in any digit
# breaks those identities at ~1e-10.
WAVELET_FILTERS = {
    "haar": np.array([0.7071067811865476, 0.7071067811865476]),
    "db1": np.array([0.7071067811865476, 0.7071067811865476]),
    "db2": np.array(
        [
            -0.12940952255092145,
            0.22414386804185735,
            0.8365163037378079,
            0.48296291314469025,
        ]
    ),
    "db3": np.array(
        [
            0.035226291882100656,
            -0.08544127388224149,
            -0.13501102001039084,
            0.4598775021193313,
            0.8068915093133388,
            0.3326705529509569,
        ]
    ),
    "db4": np.array(
        [
            -0.010597401784997278,
            0.032883011666982945,
            0.030841381835986965,
            -0.18703481171888114,
            -0.02798376941698385,
            0.6308807679295904,
            0.7148465705525415,
            0.23037781330885523,
        ]
    ),
    "sym4": np.array(
        [
            -0.07576571478927333,
            -0.02963552764599851,
            0.49761866763201545,
            0.8037387518059161,
            0.29785779560527736,
            -0.09921954357684722,
            -0.012603967262037833,
            0.0322231006040427,
        ]
    ),
}

_DB4_LO = WAVELET_FILTERS["db4"]


def cwt_morlet(x: np.ndarray, dt: float, periods: np.ndarray, B: float = 2.0, C: float = 1.0) -> np.ndarray:
    """→ complex coefficients [n_scales, n]: W(s,·) = IFFT(X(f)·√(s·dt)·ψ̂(s·f)).

    scales s = C·period (time units); one forward FFT + one inverse FFT per
    scale — the scale axis is the embarrassingly-parallel axis at cluster
    scale (SURVEY.md §2.8).
    """
    n = len(x)
    nfft = 1 << int(2 * n - 1).bit_length()
    X = np.fft.fft(x, nfft)
    freqs = np.fft.fftfreq(nfft, d=dt)
    out = np.empty((len(periods), n), dtype=complex)
    for i, p in enumerate(periods):
        s = C * float(p)
        psi_hat = np.exp(-np.pi**2 * B * (s * freqs - C) ** 2)
        out[i] = np.fft.ifft(X * np.sqrt(s / dt) * psi_hat)[:n]
    return out


def hilbert_analytic(x: np.ndarray) -> np.ndarray:
    """Analytic signal via FFT (positive frequencies doubled)."""
    n = len(x)
    X = np.fft.fft(x)
    h = np.zeros(n)
    if n % 2 == 0:
        h[0] = h[n // 2] = 1
        h[1 : n // 2] = 2
    else:
        h[0] = 1
        h[1 : (n + 1) // 2] = 2
    return np.fft.ifft(X * h)


def upper_envelope(t: np.ndarray, x: np.ndarray, pad_width: int = 2) -> np.ndarray:
    """Spline through interior maxima + mirrored ghosts — the normalization
    envelope used by HHT's DQ/NHT paths (reference timefrequency.py:79,
    via get_envelope)."""
    from periodicity_spark.decomposition.kernels import (
        _padded_anchor,
        cubic_spline,
        find_extrema_idx,
    )

    peaks, _ = find_extrema_idx(x)
    if len(peaks) < pad_width:
        return np.full_like(x, np.max(np.abs(x)))
    at, av = _padded_anchor(t, x, peaks, pad_width)
    if len(at) < 2:
        return np.full_like(x, np.max(np.abs(x)))
    return cubic_spline(at, av, t)


def normalize_am_fm(t, mode, norm_type="spline", norm_iter=10, eps=1e-6):
    """Iterative amplitude normalization (Huang et al. 2009; reference
    timefrequency.py:71-89): → (A, F) with |F| ≤ 1."""
    F = mode.astype(float).copy()
    A = np.ones_like(F)
    for _ in range(norm_iter):
        if norm_type == "hilbert":
            env = np.abs(hilbert_analytic(F))
        else:  # spline
            env = upper_envelope(t, np.abs(F))
        with np.errstate(divide="ignore", invalid="ignore"):
            F = F / env
        F = np.nan_to_num(F, nan=0.0, posinf=0.0, neginf=0.0)
        A = A * env
        if np.max(np.abs(F)) - 1.0 < eps:
            break
    return A, np.clip(F, -1.0, 1.0)


def instant_freq_amp(t, mode, method="DQ", norm_type="spline", norm_iter=10):
    """Instantaneous frequency + amplitude of one AM-FM mode (reference
    timefrequency.py:109-134). → (freq, amp)."""
    if method == "DQ":
        A, F = normalize_am_fm(t, mode, norm_type, norm_iter)
        amp = A
        phi = np.arctan2(np.sqrt(np.clip(1 - F**2, 0, None)), F)
        corr = np.sign(np.gradient(phi))
        phi = np.unwrap(phi * corr)
        freq = np.gradient(phi, t) / (2 * np.pi)
    elif method == "NHT":
        A, F = normalize_am_fm(t, mode, norm_type, norm_iter)
        amp = A
        phi = np.unwrap(np.angle(hilbert_analytic(F)))
        freq = np.gradient(phi, t) / (2 * np.pi)
    elif method == "HT":
        analytic = hilbert_analytic(mode)
        amp = np.abs(analytic)
        phi = np.unwrap(np.angle(analytic))
        freq = np.gradient(phi, t) / (2 * np.pi)
    elif method == "TEO":
        # Teager energy method (reference timefrequency.py:123-128; the
        # reference applies it to the whole signal — here per mode, the
        # standard formulation): f = √(TEO(ẋ)/TEO(x))/2π, a = TEO(x)/√TEO(ẋ)
        def teo_of(x):
            d1 = np.gradient(x, t)
            return d1 * d1 - x * np.gradient(d1, t)

        teo_x = teo_of(mode)
        teo_xdot = teo_of(np.gradient(mode, t))
        with np.errstate(divide="ignore", invalid="ignore"):
            amp = teo_x / np.sqrt(np.abs(teo_xdot))
            freq = np.sqrt(np.abs(teo_xdot / teo_x)) / (2 * np.pi)
        amp = np.nan_to_num(amp)
        freq = np.nan_to_num(freq)
    else:
        raise ValueError(f"Method {method} is unknown.")
    return freq, amp


def _dwt_per(x, lo):
    """One periodized DWT level: → (approx, detail)."""
    n = len(x)
    hi = lo[::-1].copy()
    hi[1::2] *= -1  # QMF
    L = len(lo)
    # periodized convolution then downsample by 2
    ext = np.concatenate([x[-(L - 1):], x]) if n >= L - 1 else np.concatenate([np.tile(x, (L - 1) // n + 1)[-(L - 1):], x])
    a = np.convolve(ext, lo[::-1], mode="valid")[1::2][: (n + 1) // 2]
    d = np.convolve(ext, hi[::-1], mode="valid")[1::2][: (n + 1) // 2]
    return a, d


def _idwt_per(a, d, lo, n):
    hi = lo[::-1].copy()
    hi[1::2] *= -1
    L = len(lo)
    up_a = np.zeros(2 * len(a))
    up_a[::2] = a
    up_d = np.zeros(2 * len(d))
    up_d[::2] = d
    # periodized reconstruction
    ext_a = np.concatenate([up_a, up_a[: L - 2]])
    ext_d = np.concatenate([up_d, up_d[: L - 2]])
    y = np.convolve(ext_a, lo, mode="full") + np.convolve(ext_d, hi, mode="full")
    y = y[L - 2 : L - 2 + 2 * len(a)]
    return y[:n]


def denoise_dwt(
    x: np.ndarray, sigma: float, detrend: bool = False, wavelet: str = "db4"
) -> np.ndarray:
    """Wavelet shrinkage (reference timefrequency.py:151-159): periodized
    wavedec in the requested family → soft-threshold σ√(2 ln N) on detail
    coefficients → waverec. The reference forwards ``wavelet`` to pywt;
    here it selects from WAVELET_FILTERS (the DWT machinery is generic
    over the filter)."""
    try:
        lo = WAVELET_FILTERS[wavelet]
    except KeyError:
        raise ValueError(
            f"unknown wavelet {wavelet!r}; available: {sorted(WAVELET_FILTERS)}"
        ) from None
    n = len(x)
    threshold = sigma * np.sqrt(2 * np.log(n))
    levels = max(1, int(np.log2(max(n, 8))) - 3)
    # periodized DWT needs an even length at every level: extend by
    # repeating the last sample (pywt periodization convention for odd
    # signals) up to a multiple of 2^levels, trim back on return
    m = -(-n // (1 << levels)) * (1 << levels)
    approx = x.astype(float)
    if m > n:
        approx = np.concatenate([approx, np.full(m - n, approx[-1])])
    details = []
    for _ in range(levels):
        if len(approx) < len(lo):
            break
        approx, d = _dwt_per(approx, lo)
        details.append(d)
    if detrend:
        approx = np.zeros_like(approx)
    soft = [np.sign(d) * np.maximum(np.abs(d) - threshold, 0.0) for d in details]
    y = approx
    for d in reversed(soft):
        y = _idwt_per(y, d, lo, 2 * len(d) if 2 * len(d) else len(y))
    return y[:n]


def denoise_db4(x: np.ndarray, sigma: float, detrend: bool = False) -> np.ndarray:
    """Back-compat alias: denoise_dwt with the db4 default."""
    return denoise_dwt(x, sigma, detrend, "db4")
