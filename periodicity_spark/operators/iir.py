"""NumPy-only IIR Butterworth design + zero-phase filtering.

The reference delegates to scipy (butter + sosfiltfilt, core.py:776-807);
this container has no scipy, so the textbook pipeline is implemented here:
analog Butterworth prototype → frequency transform (lp/hp/bp) → bilinear
transform → second-order sections → forward-backward filtering with odd
extension (zero phase). All formulas are standard DSP (Oppenheim & Schafer).

IIR recursion is inherently sequential → this runs inside per-series Arrow
UDFs only (SURVEY.md §7 "what's hard").
"""

from __future__ import annotations

import numpy as np


def _butter_prototype(n: int) -> np.ndarray:
    k = np.arange(1, n + 1)
    return np.exp(1j * np.pi * (2 * k + n - 1) / (2 * n))


def _poly(roots: np.ndarray) -> np.ndarray:
    p = np.array([1.0 + 0j])
    for r in roots:
        p = np.convolve(p, [1.0, -r])
    return p


def butter_sos(order: int, Wn, btype: str = "lowpass") -> np.ndarray:
    """Digital Butterworth as second-order sections [n_sections, 6].
    Wn: cutoff(s) normalized to Nyquist (scipy convention)."""
    fs = 2.0
    wn = np.atleast_1d(np.asarray(Wn, dtype=float))
    if np.any(wn <= 0) or np.any(wn >= 1):
        # scipy.signal.butter's contract: digital critical frequencies live
        # strictly inside (0, Nyquist); outside it the tan() prewarp folds
        # and the design silently goes NaN
        raise ValueError(
            f"critical frequencies must satisfy 0 < Wn < 1 (got {wn.tolist()})"
        )
    p = _butter_prototype(order)
    z = np.array([], dtype=complex)
    k = 1.0

    if btype in ("lowpass", "highpass"):
        wo = 2 * fs * np.tan(np.pi * float(Wn) / fs)
        if btype == "lowpass":
            p = p * wo
            k *= wo**order
        else:
            k *= np.real(np.prod(-p))
            p = wo / p
            z = np.zeros(order, dtype=complex)
    elif btype == "bandpass":
        w1 = 2 * fs * np.tan(np.pi * float(Wn[0]) / fs)
        w2 = 2 * fs * np.tan(np.pi * float(Wn[1]) / fs)
        bw = w2 - w1
        wo = np.sqrt(w1 * w2)
        p_lp = p * bw / 2
        disc = np.sqrt(p_lp**2 - wo**2 + 0j)
        p = np.concatenate([p_lp + disc, p_lp - disc])
        z = np.zeros(order, dtype=complex)
        k *= bw**order
    else:
        raise ValueError(btype)

    # bilinear transform
    fs2 = 2.0 * fs
    z_d = (fs2 + z) / (fs2 - z)
    p_d = (fs2 + p) / (fs2 - p)
    k_d = k * np.real(np.prod(fs2 - z) / np.prod(fs2 - p))
    # pad zeros at z = -1 to equal degree
    z_d = np.concatenate([z_d, -np.ones(len(p_d) - len(z_d))])

    # pair into biquads: conjugate pole pairs (+ one real for odd order)
    pole_order = np.argsort(np.abs(np.abs(p_d) - 1))  # farthest from circle first
    p_d = p_d[pole_order]
    used = np.zeros(len(p_d), bool)
    pairs = []
    for i in range(len(p_d)):
        if used[i]:
            continue
        used[i] = True
        if abs(p_d[i].imag) > 1e-12:
            j = np.argmin(np.where(used, np.inf, np.abs(p_d - np.conj(p_d[i]))))
            used[j] = True
            pairs.append((p_d[i], p_d[j]))
        else:
            # try to pair with another real pole
            reals = [j for j in range(len(p_d)) if not used[j] and abs(p_d[j].imag) < 1e-12]
            if reals:
                used[reals[0]] = True
                pairs.append((p_d[i], p_d[reals[0]]))
            else:
                pairs.append((p_d[i], None))
    zs = list(z_d)
    sos = []
    for a_pair in pairs:
        if a_pair[1] is None:
            a = np.real(_poly(np.array([a_pair[0]])))
            zz = [zs.pop()] if zs else []
            b = np.real(_poly(np.array(zz)))
            sos.append([b[0], b[1] if len(b) > 1 else 0.0, 0.0, a[0], a[1], 0.0])
        else:
            a = np.real(_poly(np.array(a_pair)))
            zz = [zs.pop() for _ in range(min(2, len(zs)))]
            b = np.real(_poly(np.array(zz)))
            b = np.pad(b, (0, 3 - len(b)))
            sos.append([b[0], b[1], b[2], a[0], a[1], a[2]])
    sos = np.array(sos)
    sos[0, :3] *= k_d
    return sos


def _sosfilt(sos: np.ndarray, x: np.ndarray, zi: np.ndarray | None = None) -> tuple[np.ndarray, np.ndarray]:
    n_sections = len(sos)
    if zi is None:
        zi = np.zeros((n_sections, 2))
    zf = zi.copy()
    # Python-float recursion: numpy scalars pay ~1 µs of boxing per op, which
    # dominates at 1M-sample series; plain floats run the identical IEEE-754
    # double arithmetic ~20x faster (bit-identical output)
    y = x.astype(float).tolist()
    for s in range(n_sections):
        b0, b1, b2, _a0, a1, a2 = (float(c) for c in sos[s])
        z1, z2 = float(zf[s][0]), float(zf[s][1])
        for i in range(len(y)):
            xn = y[i]
            yn = b0 * xn + z1
            z1 = b1 * xn - a1 * yn + z2
            z2 = b2 * xn - a2 * yn
            y[i] = yn
        zf[s] = (z1, z2)
    return np.asarray(y), zf


def _sos_zi(sos: np.ndarray) -> np.ndarray:
    """Steady-state initial conditions per section for unit DC input,
    accounting for the DC gain of preceding sections."""
    n_sections = len(sos)
    zi = np.zeros((n_sections, 2))
    scale = 1.0
    for s in range(n_sections):
        b0, b1, b2, _a0, a1, a2 = sos[s]
        gain = (b0 + b1 + b2) / (1 + a1 + a2)
        z2 = (b2 - a2 * gain) * scale
        z1 = (b1 - a1 * gain) * scale + z2
        zi[s] = (z1, z2)
        scale *= gain
    return zi


def sosfiltfilt(sos: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Zero-phase forward-backward filtering with odd-extension padding."""
    n = len(x)
    padlen = min(n - 1, 3 * (2 * len(sos) + 1))
    if padlen > 0:
        left = 2 * x[0] - x[1 : padlen + 1][::-1]
        right = 2 * x[-1] - x[-padlen - 1 : -1][::-1]
        ext = np.concatenate([left, x, right])
    else:
        ext = x.astype(float)
    zi = _sos_zi(sos)
    y, _ = _sosfilt(sos, ext, zi * ext[0])
    y = y[::-1]
    y, _ = _sosfilt(sos, y, zi * y[0])
    y = y[::-1]
    if padlen > 0:
        y = y[padlen:-padlen]
    return y


def nelder_mead(fun, x0, max_iter=400, xatol=1e-6, fatol=1e-8):
    """Minimal Nelder-Mead simplex minimizer (Nelder & Mead 1965) —
    stand-in for scipy.optimize.minimize in UDF kernels."""
    x0 = np.asarray(x0, float)
    ndim = len(x0)
    simplex = [x0]
    for i in range(ndim):
        xi = x0.copy()
        xi[i] = xi[i] + (0.05 if xi[i] != 0 else 0.00025)
        simplex.append(xi)
    simplex = np.array(simplex)
    fvals = np.array([fun(v) for v in simplex])
    for _ in range(max_iter):
        order = np.argsort(fvals)
        simplex, fvals = simplex[order], fvals[order]
        if (
            np.max(np.abs(simplex[1:] - simplex[0])) < xatol
            and np.max(np.abs(fvals[1:] - fvals[0])) < fatol
        ):
            break
        centroid = simplex[:-1].mean(axis=0)
        xr = centroid + (centroid - simplex[-1])
        fr = fun(xr)
        if fr < fvals[0]:
            xe = centroid + 2 * (centroid - simplex[-1])
            fe = fun(xe)
            simplex[-1], fvals[-1] = (xe, fe) if fe < fr else (xr, fr)
        elif fr < fvals[-2]:
            simplex[-1], fvals[-1] = xr, fr
        else:
            xc = centroid + 0.5 * (simplex[-1] - centroid)
            fc = fun(xc)
            if fc < fvals[-1]:
                simplex[-1], fvals[-1] = xc, fc
            else:
                for i in range(1, len(simplex)):
                    simplex[i] = simplex[0] + 0.5 * (simplex[i] - simplex[0])
                    fvals[i] = fun(simplex[i])
    best = np.argmin(fvals)
    return simplex[best], fvals[best]
