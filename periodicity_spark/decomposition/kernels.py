"""Pure-NumPy single-series kernels for the decomposition operators.

These are the per-series leaves executed inside Arrow-batched UDFs — the
parts of the reference that are irreducibly sequential (data-dependent
sifting loops, reference decomposition.py:72-91). Everything here is
scipy-free: own not-a-knot cubic spline, own envelope construction.

Algorithms (public literature):
- EMD sifting with Rilling stopping criteria (Rilling, Flandrin, Gonçalves
  2003), matching reference decomposition.py:45-117 semantics: envelopes
  through interior extrema plus 2 mirrored ghost extrema per side, IMF test
  mean(σ>θ₁)<α ∧ all(σ<θ₂) ∧ |n_zero−n_ext|≤1.
- LMD (Smith 2005), matching reference decomposition.py:120-203 semantics.

This module is shipped to executors via ``session.ensure_worker_imports``.
"""

from __future__ import annotations

import numpy as np


def cubic_spline(xk: np.ndarray, yk: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Not-a-knot cubic spline interpolation (the classic tridiagonal solve).
    Extrapolates with the boundary cubics, like scipy splev on an
    interpolating spline. Falls back to linear for < 4 knots."""
    n = len(xk)
    if n < 2:
        return np.full_like(x, yk[0] if n else np.nan, dtype=float)
    if n < 4:
        return np.interp(x, xk, yk)
    h = np.diff(xk)
    # build the not-a-knot system for second derivatives M[0..n-1]
    A = np.zeros((n, n))
    rhs = np.zeros(n)
    for i in range(1, n - 1):
        A[i, i - 1] = h[i - 1]
        A[i, i] = 2 * (h[i - 1] + h[i])
        A[i, i + 1] = h[i]
        rhs[i] = 6 * ((yk[i + 1] - yk[i]) / h[i] - (yk[i] - yk[i - 1]) / h[i - 1])
    # not-a-knot: third derivative continuous at x1 and x_{n-2}
    A[0, 0] = -h[1]
    A[0, 1] = h[0] + h[1]
    A[0, 2] = -h[0]
    A[n - 1, n - 3] = -h[-1]
    A[n - 1, n - 2] = h[-2] + h[-1]
    A[n - 1, n - 1] = -h[-2]
    M = np.linalg.solve(A, rhs)
    # evaluate piecewise; clamp segment index for extrapolation
    idx = np.clip(np.searchsorted(xk, x) - 1, 0, n - 2)
    x0, x1 = xk[idx], xk[idx + 1]
    hi = x1 - x0
    a = (x1 - x) / hi
    b = (x - x0) / hi
    return (
        a * yk[idx]
        + b * yk[idx + 1]
        + ((a**3 - a) * M[idx] + (b**3 - b) * M[idx + 1]) * hi * hi / 6.0
    )


def find_extrema_idx(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Interior strict local maxima / minima indices (scipy-find_peaks-like
    for non-plateau data; reference core.py:283-339)."""
    mid = x[1:-1]
    peaks = np.where((mid > x[:-2]) & (mid > x[2:]))[0] + 1
    dips = np.where((mid < x[:-2]) & (mid < x[2:]))[0] + 1
    return peaks, dips


def count_zero_crossings(x: np.ndarray) -> int:
    """reference core.py:341-367: sign-bit flips."""
    return int(np.count_nonzero(np.diff(np.signbit(x))))


def _padded_anchor(t, x, idx, pad_width):
    """Anchor points for one envelope: interior extrema + ``pad_width``
    ghost points mirrored about each edge SAMPLE (time reflected oddly about
    t[0]/t[-1], values reflected evenly) — reference sift's
    pad(reflect, reflect_type=["odd", None]) followed by dropping the edge
    samples themselves (decomposition.py:55-60)."""
    ti, vi = t[idx], x[idx]
    lt = 2 * t[0] - ti[:pad_width][::-1]
    lv = vi[:pad_width][::-1]
    rt = 2 * t[-1] - ti[-pad_width:][::-1]
    rv = vi[-pad_width:][::-1]
    at = np.concatenate([lt[::-1], ti, rt[::-1]])
    av = np.concatenate([lv[::-1], vi, rv[::-1]])
    order = np.argsort(at)
    return at[order], av[order]


def emd_sift(t, x, pad_width=2):
    """One sifting pass (reference decomposition.py:45-70):
    → (mu, sigma, n_ext, n_zero). Raises ValueError when too few extrema."""
    peaks, dips = find_extrema_idx(x)
    n_ext = len(peaks) + len(dips)
    n_zero = count_zero_crossings(x)
    if len(peaks) < pad_width or len(dips) < pad_width:
        raise ValueError("not enough extrema")
    pt, pv = _padded_anchor(t, x, peaks, pad_width)
    dt_, dv = _padded_anchor(t, x, dips, pad_width)
    if len(pt) < 4 or len(dt_) < 4:
        raise ValueError("not enough extrema for interpolation")
    upper = cubic_spline(pt, pv, t)
    lower = cubic_spline(dt_, dv, t)
    mu = (upper + lower) / 2
    amp = (upper - lower) / 2
    with np.errstate(divide="ignore", invalid="ignore"):
        sigma = np.abs(mu / amp)
    return mu, sigma, n_ext, n_zero


def emd_iter(t, x, max_iter=2000, pad_width=2, theta_1=0.05, theta_2=0.50, alpha=0.05):
    """Sift until IMF criteria or monotonic (reference decomposition.py:72-91).
    → (mode, is_monotonic)."""
    mode = x.copy()
    for _ in range(max_iter):
        try:
            mu, sigma, n_ext, n_zero = emd_sift(t, mode, pad_width)
        except ValueError:
            return mode, True
        is_imf = np.mean(sigma > theta_1) < alpha
        is_imf = is_imf and np.all(sigma < theta_2)
        is_imf = is_imf and abs(n_zero - n_ext) <= 1
        if is_imf:
            break
        mode = mode - mu
    return mode, False


def emd(t, x, max_modes=None, **kw):
    """Full EMD (reference decomposition.py:93-117): → (modes, residue)."""
    if max_modes is None:
        max_modes = np.inf
    imfs = []
    residue = x.astype(float).copy()
    is_monotonic = len(x) < 4
    while not is_monotonic and len(imfs) < max_modes:
        mode, is_monotonic = emd_iter(t, residue, **kw)
        if not is_monotonic:
            imfs.append(mode)
            residue = residue - mode
    return imfs, residue


def _triangle_kernel(width):
    half = int(width // 2)
    w = np.array(list(range(1, half + 2)) + list(range(half, 0, -1)), float)
    return w / w.sum()


def _smooth_mirror(x, kern):
    k = len(kern) // 2
    if len(x) < 2:
        return x.copy()
    pad_l = x[1 : k + 1][::-1]
    pad_r = x[-k - 1 : -1][::-1]
    padded = np.concatenate([pad_l, x, pad_r])
    return np.convolve(padded, kern[::-1], mode="valid")


def lmd_sift(t, x, dt, smooth_iter=12):
    """One LMD sifting pass (reference decomposition.py:127-163):
    zero-order-hold local mean/envelope from alternating extrema, triangle
    smoothing, resampled to t. → (mu, env). Raises ValueError when too few
    extrema. Assumes uniform sampling (reference uses sig.dt)."""
    peaks, dips = find_extrema_idx(x)
    # reference: peaks include edges, dips don't (decomposition.py:129-131)
    ext_idx = np.sort(np.concatenate([[0, len(x) - 1], peaks, dips])).astype(int)
    ext_idx = np.unique(ext_idx)
    if len(ext_idx) < 3:
        raise ValueError("not enough extrema")
    et, ev = t[ext_idx], x[ext_idx]
    # mid/half-range of consecutive extrema (roll(1) pairs each extremum
    # with its predecessor; first uses the second's value per
    # decomposition.py:143-148)
    mu_e = 0.5 * (np.roll(ev, 1) + ev)
    env_e = 0.5 * np.abs(np.roll(ev, 1) - ev)
    mu_e[0] = mu_e[1]
    env_e[0] = env_e[1]
    # zero-order hold onto the uniform grid (bfill: each grid point takes the
    # value of the next extremum at-or-after it)
    pos = np.searchsorted(et, t, side="left")
    pos = np.clip(pos, 0, len(et) - 1)
    mu_g = mu_e[pos]
    env_g = env_e[pos]
    # triangle smoothing; window from the largest extrema gap — clamped to
    # 2n−1 (odd by construction): the mirror pad reflects at most n−1
    # samples per side, so a larger kernel (irregular sampling: one gap
    # ≫ median dt on a short series) would shrink the convolution output
    # below n and crash the (Fc − mu)/env broadcast downstream
    window = np.max(np.diff(et) / dt) // 3
    window = int(max(3, window + (1 - window % 2)))
    window = min(window, 2 * len(x) - 1)
    kern = _triangle_kernel(window)
    for _ in range(smooth_iter):
        mu_g = _smooth_mirror(mu_g, kern)
        if np.all(np.diff(mu_g)):
            break
    for _ in range(smooth_iter):
        env_g = _smooth_mirror(env_g, kern)
        if np.all(np.diff(env_g)):
            break
    return mu_g, env_g


def lmd(t, x, max_modes=None, max_iter=10, smooth_iter=12, eps=1e-6):
    """Full LMD (reference decomposition.py:165-203): → list of (A, F) pairs
    + residue. Assumes uniform sampling."""
    if max_modes is None:
        max_modes = np.inf
    dt = float(np.median(np.diff(t)))
    pfs = []
    residue = x.astype(float).copy()
    is_monotonic = len(x) < 4
    while not is_monotonic and len(pfs) < max_modes:
        Fc = residue.copy()
        A = np.ones_like(Fc)
        for _ in range(max_iter):
            try:
                mu, env = lmd_sift(t, Fc, dt, smooth_iter)
            except ValueError:
                is_monotonic = True
                break
            with np.errstate(divide="ignore", invalid="ignore"):
                Fc = (Fc - mu) / env
            Fc = np.nan_to_num(Fc, nan=0.0, posinf=0.0, neginf=0.0)
            A = A * env
            if np.max(np.abs(Fc)) - 1.0 < eps:
                break
        if is_monotonic:
            break
        Fc = np.clip(Fc, -1.0, 1.0)
        pfs.append((A, Fc))
        residue = residue - A * Fc
    return pfs, residue


def ceemdan_1d(
    t,
    x,
    epsilon=0.2,
    ensemble_size=50,
    min_energy=0.0,
    seed=0,
    max_modes=None,
    hard_mode_cap=16,
    sid_crc=0,
    **emd_kw,
):
    """Single-series CEEMDAN (reference decomposition.py:210-342) — the same
    algorithm the distributed CEEMDAN class runs as Spark jobs, here as one
    in-process kernel so a bucketed Arrow task can decompose a whole series
    with zero driver round-trips. Seeding matches the distributed path
    (crc32(series_id) ⊕ seed·2654435761 + realization), so both strategies
    draw identical noise. → list of modes (each len(t))."""
    t = np.asarray(t, float)
    x = np.asarray(x, float)
    sigma_x = float(np.std(x))
    if sigma_x == 0 or len(x) < 4:
        return []
    cap = hard_mode_cap if max_modes is None else min(max_modes, hard_mode_cap)
    mm = max_modes if max_modes is not None else hard_mode_cap

    noise_modes = []
    for r in range(ensemble_size):
        rng = np.random.default_rng(
            (sid_crc & 0xFFFFFFFF) ^ (seed * 2654435761 + r) & 0x7FFFFFFF
        )
        noise = rng.standard_normal(len(t))
        nm, _ = emd(t, noise, **emd_kw)
        noise_modes.append(nm)

    residue = x / sigma_x
    modes = []
    k = 0
    while k < cap:
        beta = epsilon * float(np.std(residue))
        acc = np.zeros(len(t))
        for r in range(ensemble_size):
            nm = noise_modes[r]
            if k < len(nm):
                scale = beta / float(np.std(nm[0])) if k == 0 else beta
                noisy = residue + scale * nm[k]
            else:
                noisy = residue
            first, _ = emd(t, noisy, max_modes=1, **emd_kw)
            acc += noisy - first[0] if first else np.zeros(len(t))
        mu = acc / ensemble_size
        modes.append(residue - mu)
        residue = mu
        k += 1
        if float(np.var(residue)) < min_energy:
            break
        n_residue_modes = len(emd(t, residue, **emd_kw)[0])
        if n_residue_modes == 1:
            if k < mm:
                modes.append(residue.copy())
            break
        if n_residue_modes < 1:
            break
    return [m * sigma_x for m in modes]
