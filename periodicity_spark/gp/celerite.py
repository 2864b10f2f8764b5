"""Celerite-style O(N) Gaussian-process kernels (reference gp.py:340-538).

The reference's CeleriteModeler family (BrownianGP / HarmonicGP) delegates to
celerite2, which is not in this image. The same public algorithm — the
semiseparable Cholesky factorization of Foreman-Mackey et al. 2017
(AJ 154:220, arXiv:1703.09710) — is implemented here directly in NumPy:

- a celerite kernel is a mixture of exponential terms
  k(τ) = Σ_j a_j e^{−c_j τ} cos(d_j τ) + b_j e^{−c_j τ} sin(d_j τ);
  the resulting K is semiseparable with rank J = n_real + 2·n_complex,
  so Cholesky, log-det and triangular solves all run in O(N·J²).
- SHOTerm coefficients (underdamped complex pair / overdamped real pair,
  paper eqs. 20-23) with celerite2's (sigma, rho, tau) parameterization:
  ω0 = 2π/ρ, Q = πτ/ρ, S0 = σ²/(ω0 Q).
- BrownianTerm (reference gp.py:487-500): SHO(σ√mix, tau, period) +
  overdamped SHO(S0, w0, Q=0.01).
- RotationTerm (celerite2's documented two-SHO form, used by reference
  HarmonicGP gp.py:521-538).
- unit-hypercube prior transforms matching BrownianGP.prior_transform
  (gp.py:510-520) and HarmonicGP.prior_transform (gp.py:527-538), built on
  an own inverse-normal-CDF (Acklam's rational approximation, |ε|<1.2e-9).

Numerical shape: U/V carry only bounded cos/sin phases; all exponential
decay lives in the inter-sample propagators P = e^{−c Δt} ≤ 1, so the
factorization never overflows regardless of baseline (the stable
formulation of §5.1 of the paper).
"""

from __future__ import annotations

import math

import numpy as np

LN2PI = math.log(2.0 * math.pi)

# Acklam's inverse normal CDF rational approximation coefficients (public).
_A = (-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
      1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
_B = (-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
      6.680131188771972e+01, -1.328068155288572e+01)
_C = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
      -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
_D = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
      3.754408661907416e+00)


def norm_ppf(u, mu: float = 0.0, sd: float = 1.0):
    """Inverse normal CDF (quantile), vectorized; Acklam's approximation."""
    u = np.asarray(u, float)
    scalar = u.ndim == 0
    u = np.atleast_1d(u).copy()
    u = np.clip(u, 1e-300, 1 - 1e-16)
    x = np.empty_like(u)
    lo, hi = 0.02425, 1 - 0.02425
    m = u < lo
    if m.any():
        q = np.sqrt(-2 * np.log(u[m]))
        x[m] = ((((((_C[0] * q + _C[1]) * q + _C[2]) * q + _C[3]) * q + _C[4]) * q + _C[5])
                / ((((_D[0] * q + _D[1]) * q + _D[2]) * q + _D[3]) * q + 1))
    m = (u >= lo) & (u <= hi)
    if m.any():
        q = u[m] - 0.5
        r = q * q
        x[m] = ((((((_A[0] * r + _A[1]) * r + _A[2]) * r + _A[3]) * r + _A[4]) * r + _A[5]) * q
                / (((((_B[0] * r + _B[1]) * r + _B[2]) * r + _B[3]) * r + _B[4]) * r + 1))
    m = u > hi
    if m.any():
        q = np.sqrt(-2 * np.log(1 - u[m]))
        x[m] = -((((((_C[0] * q + _C[1]) * q + _C[2]) * q + _C[3]) * q + _C[4]) * q + _C[5])
                 / ((((_D[0] * q + _D[1]) * q + _D[2]) * q + _D[3]) * q + 1))
    out = mu + sd * x
    return float(out[0]) if scalar else out


# --------------------------------------------------------------------------
# term coefficients


class CeleriteCoeffs:
    """Exponential-mixture coefficients: real terms (ar, cr) and complex
    terms (ac, bc, cc, dc). Column rank J = n_real + 2·n_complex."""

    __slots__ = ("ar", "cr", "ac", "bc", "cc", "dc")

    def __init__(self, ar=(), cr=(), ac=(), bc=(), cc=(), dc=()):
        self.ar = np.asarray(ar, float)
        self.cr = np.asarray(cr, float)
        self.ac = np.asarray(ac, float)
        self.bc = np.asarray(bc, float)
        self.cc = np.asarray(cc, float)
        self.dc = np.asarray(dc, float)

    def __add__(self, other: "CeleriteCoeffs") -> "CeleriteCoeffs":
        return CeleriteCoeffs(
            np.concatenate([self.ar, other.ar]), np.concatenate([self.cr, other.cr]),
            np.concatenate([self.ac, other.ac]), np.concatenate([self.bc, other.bc]),
            np.concatenate([self.cc, other.cc]), np.concatenate([self.dc, other.dc]),
        )

    @property
    def variance(self) -> float:
        """k(0) = Σ a_j."""
        return float(self.ar.sum() + self.ac.sum())

    def value(self, tau) -> np.ndarray:
        """Dense k(τ) — for small-N differentials and the dense cross-check."""
        tau = np.abs(np.asarray(tau, float))
        k = np.zeros_like(tau)
        for a, c in zip(self.ar, self.cr):
            k += a * np.exp(-c * tau)
        for a, b, c, d in zip(self.ac, self.bc, self.cc, self.dc):
            k += np.exp(-c * tau) * (a * np.cos(d * tau) + b * np.sin(d * tau))
        return k

    def psd(self, freq) -> np.ndarray:
        """Power spectral density at cyclic frequencies (paper eq. 9)."""
        w2 = (2 * np.pi * np.asarray(freq, float)) ** 2
        s = np.zeros_like(w2)
        for a, b, c, d in [(a, 0.0, c, 0.0) for a, c in zip(self.ar, self.cr)] + list(
            zip(self.ac, self.bc, self.cc, self.dc)
        ):
            c2, d2 = c * c, d * d
            s += ((a * c + b * d) * (c2 + d2) + (a * c - b * d) * w2) / (
                w2 * w2 + 2 * (c2 - d2) * w2 + (c2 + d2) ** 2
            )
        return np.sqrt(2.0 / np.pi) * s


def sho_coeffs(S0: float, w0: float, Q: float) -> CeleriteCoeffs:
    """Stochastically-driven harmonic oscillator term (paper eqs. 20-23)."""
    if Q >= 0.5:
        Q = max(Q, 0.5 + 1e-8)  # critically-damped limit is singular
        eta = math.sqrt(4 * Q * Q - 1)
        a = S0 * w0 * Q
        c = w0 / (2 * Q)
        return CeleriteCoeffs(ac=[a], bc=[a / eta], cc=[c], dc=[c * eta])
    f = math.sqrt(1 - 4 * Q * Q)
    aq = 0.5 * S0 * w0 * Q
    c0 = w0 / (2 * Q)
    return CeleriteCoeffs(
        ar=[aq * (1 + 1 / f), aq * (1 - 1 / f)],
        cr=[c0 * (1 - f), c0 * (1 + f)],
    )


def sho_from_sigma_rho_tau(sigma: float, rho: float, tau: float) -> CeleriteCoeffs:
    """celerite2 SHOTerm(sigma=, rho=, tau=): ω0 = 2π/ρ, Q = πτ/ρ."""
    w0 = 2 * math.pi / rho
    Q = math.pi * tau / rho
    return sho_coeffs(sigma * sigma / (w0 * Q), w0, Q)


def brownian_coeffs(sigma: float, tau: float, period: float, mix: float) -> CeleriteCoeffs:
    """Reference BrownianTerm (gp.py:487-500): quasi-periodic SHO plus a
    strongly-overdamped (Q=0.01) background SHO."""
    Q = 0.01
    sigma_1 = sigma * math.sqrt(mix)
    f = math.sqrt(1 - 4 * Q * Q)
    w0 = 2 * Q / (tau * (1 - f))
    S0 = (1 - mix) * sigma**2 / (0.5 * w0 * Q * (1 + 1 / f))
    return sho_from_sigma_rho_tau(sigma_1, period, tau) + sho_coeffs(S0, w0, Q)


def rotation_coeffs(sigma: float, period: float, Q0: float, dQ: float, f: float) -> CeleriteCoeffs:
    """celerite2 RotationTerm: two SHOs at the period and its half."""
    amp = sigma * sigma / (1 + f)
    Q1 = 0.5 + Q0 + dQ
    w1 = 4 * math.pi * Q1 / (period * math.sqrt(4 * Q1 * Q1 - 1))
    S1 = amp / (w1 * Q1)
    Q2 = 0.5 + Q0
    w2 = 8 * math.pi * Q2 / (period * math.sqrt(4 * Q2 * Q2 - 1))
    S2 = f * amp / (w2 * Q2)
    return sho_coeffs(S1, w1, Q1) + sho_coeffs(S2, w2, Q2)


# --------------------------------------------------------------------------
# O(N) factorization / solve (paper §5.1, stable formulation)


def _build_uvp(t: np.ndarray, k: CeleriteCoeffs):
    N = len(t)
    nr, nc = len(k.ar), len(k.ac)
    J = nr + 2 * nc
    U = np.empty((N, J))
    V = np.empty((N, J))
    if nr:
        U[:, :nr] = k.ar
        V[:, :nr] = 1.0
    if nc:
        arg = k.dc[None, :] * t[:, None]
        cosd, sind = np.cos(arg), np.sin(arg)
        U[:, nr:nr + nc] = k.ac * cosd + k.bc * sind
        U[:, nr + nc:] = k.ac * sind - k.bc * cosd
        V[:, nr:nr + nc] = cosd
        V[:, nr + nc:] = sind
    dt = np.diff(t)
    P = np.empty((N - 1, J))
    if nr:
        P[:, :nr] = np.exp(-k.cr[None, :] * dt[:, None])
    if nc:
        ec = np.exp(-k.cc[None, :] * dt[:, None])
        P[:, nr:nr + nc] = ec
        P[:, nr + nc:] = ec
    return U, V, P


def celerite_factor(t: np.ndarray, diag: np.ndarray, k: CeleriteCoeffs):
    """K = L·diag(D)·Lᵀ with semiseparable L. → (U, P, D, W) or None if K
    is not positive definite at these parameters."""
    U, V, P = _build_uvp(t, k)
    N, J = U.shape
    A = diag + k.variance
    D = np.empty(N)
    W = np.empty((N, J))
    S = np.zeros((J, J))
    if A[0] <= 0:
        return None
    D[0] = A[0]
    W[0] = V[0] / D[0]
    for n in range(1, N):
        p = P[n - 1]
        S += D[n - 1] * np.outer(W[n - 1], W[n - 1])
        S *= np.outer(p, p)
        Un = U[n]
        SU = S @ Un
        Dn = A[n] - Un @ SU
        if not Dn > 0:
            return None
        D[n] = Dn
        W[n] = (V[n] - SU) / Dn
    return U, P, D, W


def celerite_rss_logdet(t, y, diag, k: CeleriteCoeffs, mean: float = 0.0):
    """(rᵀK⁻¹r, log|K|) via one forward substitution — the likelihood core."""
    fac = celerite_factor(t, diag, k)
    if fac is None:
        return None
    U, P, D, W = fac
    N, J = U.shape
    r = y - mean
    f = np.zeros(J)
    z = np.empty(N)
    z[0] = r[0]
    for n in range(1, N):
        f = P[n - 1] * (f + W[n - 1] * z[n - 1])
        z[n] = r[n] - U[n] @ f
    return float(np.sum(z * z / D)), float(np.sum(np.log(D)))


def celerite_nll(t, y, diag, k: CeleriteCoeffs, mean: float = 0.0) -> float:
    out = celerite_rss_logdet(t, y, diag, k, mean)
    if out is None:
        return 1e25
    rss, logdet = out
    nll = 0.5 * (rss + logdet + len(y) * LN2PI)
    return nll if np.isfinite(nll) else 1e25


def celerite_nll_batch(t, y, diag, ks, means) -> np.ndarray:
    """NLL for B parameter sets over ONE series in a single O(N) sweep.

    The semiseparable Cholesky recursion is sequential in N, so its cost is
    dominated by Python-interpreter overhead per sample. Vectorizing the
    batch axis (every op works on (B, J, J) instead of (J, J)) pays that
    overhead once per batch — measured ~8× per-eval speedup at B=8, which is
    what makes the MCMC sampler (half-ensemble proposals arrive together)
    O(N)-practical (reference mcmc(), gp.py:428-484, leans on emcee +
    celerite2's C++ core for the same reason).

    t: (N,) times; y: (N,) values; diag: (B, N) per-walker noise diagonals;
    ks: B CeleriteCoeffs with IDENTICAL term structure (true within a kernel
    family — brownian is always 2 real + 1 complex, rotation 2 complex);
    means: (B,). → (B,) NLLs; non-positive-definite entries get 1e25.
    """
    B = len(ks)
    N = len(t)
    nr, nc = len(ks[0].ar), len(ks[0].ac)
    J = nr + 2 * nc
    diag = np.asarray(diag, float).reshape(B, N)
    means = np.asarray(means, float).reshape(B)

    U = np.empty((B, N, J))
    V = np.empty((B, N, J))
    P = np.empty((B, N - 1, J))
    dt = np.diff(t)
    var = np.empty(B)
    for b, k in enumerate(ks):
        if len(k.ar) != nr or len(k.ac) != nc:
            raise ValueError("celerite_nll_batch needs identical term structures")
        if nr:
            U[b, :, :nr] = k.ar
            V[b, :, :nr] = 1.0
            P[b, :, :nr] = np.exp(-k.cr[None, :] * dt[:, None])
        if nc:
            arg = k.dc[None, :] * t[:, None]
            cosd, sind = np.cos(arg), np.sin(arg)
            U[b, :, nr:nr + nc] = k.ac * cosd + k.bc * sind
            U[b, :, nr + nc:] = k.ac * sind - k.bc * cosd
            V[b, :, nr:nr + nc] = cosd
            V[b, :, nr + nc:] = sind
            ec = np.exp(-k.cc[None, :] * dt[:, None])
            P[b, :, nr:nr + nc] = ec
            P[b, :, nr + nc:] = ec
        var[b] = k.variance

    A = diag + var[:, None]
    r = y[None, :] - means[:, None]
    ok = A[:, 0] > 0
    Dp = np.where(ok, A[:, 0], 1.0)     # D[n-1] running value

    Wp = V[:, 0] / Dp[:, None]          # W[n-1] running value
    zp = r[:, 0]                        # z[n-1] running value
    S = np.zeros((B, J, J))
    f = np.zeros((B, J))
    z2_over_d = zp * zp / Dp            # running Σ z²/D
    logdet = np.log(Dp)                 # running Σ log D
    for n in range(1, N):
        p = P[:, n - 1]
        # forward substitution first — it needs W[n-1], z[n-1]
        f = p * (f + Wp * zp[:, None])
        S += Dp[:, None, None] * (Wp[:, :, None] * Wp[:, None, :])
        S *= p[:, :, None] * p[:, None, :]
        Un = U[:, n]
        SU = np.einsum("bij,bj->bi", S, Un)
        Dn = A[:, n] - np.einsum("bi,bi->b", Un, SU)
        ok &= Dn > 0
        Dn = np.where(Dn > 0, Dn, 1.0)
        zn = r[:, n] - np.einsum("bi,bi->b", Un, f)
        z2_over_d += zn * zn / Dn
        logdet += np.log(Dn)
        Wp = (V[:, n] - SU) / Dn[:, None]
        Dp, zp = Dn, zn
    nll = 0.5 * (z2_over_d + logdet + N * LN2PI)
    nll = np.where(ok & np.isfinite(nll), nll, 1e25)
    return nll


def _solve_factored(fac, y: np.ndarray) -> np.ndarray:
    """x = K⁻¹ y from an existing factorization: forward, scale, backward
    substitution — O(N·J) per right-hand side."""
    U, P, D, W = fac
    N, J = U.shape
    z = np.empty(N)
    f = np.zeros(J)
    z[0] = y[0]
    for n in range(1, N):
        f = P[n - 1] * (f + W[n - 1] * z[n - 1])
        z[n] = y[n] - U[n] @ f
    z /= D
    x = np.empty(N)
    g = np.zeros(J)
    x[N - 1] = z[N - 1]
    for n in range(N - 2, -1, -1):
        g = P[n] * (g + U[n + 1] * x[n + 1])
        x[n] = z[n] - W[n] @ g
    return x


def celerite_solve(t, diag, k: CeleriteCoeffs, y: np.ndarray) -> np.ndarray | None:
    """x = K⁻¹ y in O(N·J²): factor + substitutions."""
    fac = celerite_factor(t, diag, k)
    if fac is None:
        return None
    return _solve_factored(fac, y)


def celerite_loocv(t, y, diag, k: CeleriteCoeffs, mean: float = 0.0) -> float:
    """Log leave-one-out CV score (reference loocv, gp.py:394-403):
    −½ Σ [q²ᵢ/cᵢ − log cᵢ] − N/2·log 2π with q = K⁻¹r, c = diag(K⁻¹).
    The factorization is computed ONCE and reused across the N unit-vector
    solves for diag(K⁻¹) (each O(N·J)), so the whole score is O(N²·J) — a
    small-N model-comparison diagnostic, not a fit-loop objective."""
    n = len(y)
    fac = celerite_factor(t, diag, k)
    if fac is None:
        return float("-inf")
    q = _solve_factored(fac, y - mean)
    c = np.empty(n)
    e = np.zeros(n)
    for i in range(n):
        e[i] = 1.0
        c[i] = _solve_factored(fac, e)[i]
        e[i] = 0.0
    return float(-0.5 * (np.sum(q * q / c) - np.sum(np.log(c)) + n * LN2PI))


# --------------------------------------------------------------------------
# unit-hypercube prior transforms (reference gp.py:510-538)


def default_period_ppf(init_period: float, n: int):
    """Log-normal period quantile around init_period (gp.py:352-357)."""
    sd = 0.5 * math.log(max(n, 2))
    mu = math.log(init_period)

    def ppf(u):
        return np.exp(norm_ppf(u, mu, sd))

    return ppf


def make_ppf(x, pdf):
    """Empirical percent-point function (inverse CDF) for an arbitrary
    sampled PDF (reference make_ppf, gp.py:45-67): cumsum the PDF values,
    normalize, and interpolate the inverse. Grid-spacing-agnostic, exactly
    like the reference (the caller picks the x grid; the tutorial feeds the
    data-driven make_gaussian_prior mixture evaluated on a period grid, so
    MAP/MCMC period priors become data-driven)."""
    x = np.asarray(x, float)
    pdf = np.asarray(pdf, float)
    cdf = np.cumsum(pdf)
    cdf = cdf / cdf[-1]

    def ppf(q):
        return np.interp(q, cdf, x)

    return ppf


def brownian_prior_transform(u, y_mean, y_sigma, jitter, period_ppf) -> dict:
    """u ∈ (0,100)⁶ → BrownianTerm params (gp.py:510-520)."""
    u = np.asarray(u, float) / 100.0
    period = period_ppf(u[3])
    return {
        "mean": norm_ppf(u[0], y_mean, y_sigma),
        "sigma": math.exp(norm_ppf(u[1], math.log(y_sigma), 2.0)),
        "tau": period * 10 ** u[2],
        "period": period,
        "mix": u[4] * 0.5,
        "jitter": math.exp(norm_ppf(u[5], math.log(jitter), 2.0)),
    }


def harmonic_prior_transform(u, y_mean, y_sigma, jitter, period_ppf) -> dict:
    """u ∈ (0,100)⁷ → RotationTerm params (gp.py:527-538)."""
    u = np.asarray(u, float) / 100.0
    period = period_ppf(u[2])
    return {
        "mean": norm_ppf(u[0], y_mean, y_sigma),
        "sigma": math.exp(norm_ppf(u[1], math.log(y_sigma), 2.0)),
        "period": period,
        "Q0": math.exp(norm_ppf(u[3], 1.0, 5.0)),
        "dQ": math.exp(norm_ppf(u[4], 2.0, 5.0)),
        "f": u[5],
        "jitter": math.exp(norm_ppf(u[6], math.log(jitter), 2.0)),
    }


def params_to_coeffs(kernel: str, params: dict) -> CeleriteCoeffs:
    if kernel == "brownian":
        return brownian_coeffs(params["sigma"], params["tau"], params["period"], params["mix"])
    if kernel == "harmonic":
        return rotation_coeffs(
            params["sigma"], params["period"], params["Q0"], params["dQ"], params["f"]
        )
    raise ValueError(f"unknown celerite kernel: {kernel!r}")


KERNEL_NDIM = {"brownian": 6, "harmonic": 7}
PRIOR_TRANSFORMS = {"brownian": brownian_prior_transform, "harmonic": harmonic_prior_transform}


def celerite_map_fit(
    t: np.ndarray,
    y: np.ndarray,
    err: np.ndarray,
    kernel: str = "brownian",
    init_period: float | None = None,
    max_iter: int = 300,
    n_restarts: int = 4,
    u0_period: float | None = None,
    period_ppf=None,
    return_u: bool = False,
):
    """MAP fit in the unit hypercube (reference minimize(), gp.py:405-416;
    Nelder-Mead replaces scipy's L-BFGS-B — no scipy in this image). The
    simplex is restarted fresh at the incumbent until the gain per restart
    drops below 0.5 nats (collapse recovery — measured on the SpottedStar
    fixture: single-run NM stalls ~95 nats short of the L-BFGS-B optimum,
    restarts close the gap). ``u0_period`` sets the period coordinate of the
    start point (multi-start over the multimodal period axis).

    ``period_ppf`` overrides the default log-normal period quantile with an
    arbitrary inverse CDF — pass make_ppf(periods, prior_density) to use the
    data-driven make_gaussian_prior mixture (reference gp.py:45-67,341-359).
    → (params dict, nll) or (params, nll, u) with ``return_u``."""
    from periodicity_spark.operators.iir import nelder_mead

    ndim = KERNEL_NDIM[kernel]
    transform = PRIOR_TRANSFORMS[kernel]
    y_mean = float(np.mean(y))
    y_sigma = float(np.std(y))
    jitter = float(np.min(err)) ** 2
    jitter = max(jitter, 1e-12)
    n = len(y)
    if init_period is None:
        dtm = float(np.median(np.diff(t)))
        init_period = math.sqrt(n) * dtm  # gp.py:351
    ppf = period_ppf if period_ppf is not None else default_period_ppf(init_period, n)

    def nll_u(u):
        if np.any(u <= 0.01) or np.any(u >= 99.99):
            return 1e25
        params = transform(u, y_mean, y_sigma, jitter, ppf)
        k = params_to_coeffs(kernel, params)
        return celerite_nll(t, y, err**2 + params["jitter"], k, params["mean"])

    u = np.full(ndim, 50.0)
    if u0_period is not None:
        u[3 if kernel == "brownian" else 2] = float(u0_period)
    best_u, best_nll = nelder_mead(nll_u, u, max_iter=max_iter)
    for _ in range(max(n_restarts, 0)):
        nu, nf = nelder_mead(nll_u, best_u, max_iter=max_iter)
        if nf < best_nll:
            best_u, gain = nu, best_nll - nf
            best_nll = nf
            if gain < 0.5:
                break
        else:
            break
    params = transform(best_u, y_mean, y_sigma, jitter, ppf)
    if return_u:
        return params, float(best_nll), best_u
    return params, float(best_nll)


def celerite_mcmc_sample(
    t: np.ndarray,
    y: np.ndarray,
    err: np.ndarray,
    kernel: str = "brownian",
    init_period: float | None = None,
    n_walkers: int = 16,
    n_steps: int = 1000,
    burn: int = 200,
    seed: int | None = 42,
    psd_at: np.ndarray | None = None,
    period_ppf=None,
    map_max_iter: int = 300,
):
    """Posterior sampling of a celerite-family GP (reference mcmc(),
    gp.py:428-484): MAP fit seeds a walker ball (soln.x + 1e-3·N(0,1),
    gp.py:468-470), the stretch-move ensemble samples the unit hypercube
    with a flat prior (log_prob, gp.py:417-425), and every likelihood is the
    O(N·J²) celerite NLL — evaluated BATCHED across the half-ensemble
    (celerite_nll_batch), which is what replaces emcee+celerite2's C++ core.

    ``psd_at``: cyclic frequencies at which to evaluate the kernel PSD per
    posterior sample (the reference's per-sample blobs, gp.py:426,480).

    → (periods [S], psds [S, F] | None) with S = n_walkers·(n_steps−burn).
    """
    from periodicity_spark.gp.kernels import ensemble_sampler_batch

    ndim = KERNEL_NDIM[kernel]
    transform = PRIOR_TRANSFORMS[kernel]
    y_mean = float(np.mean(y))
    y_sigma = float(np.std(y))
    jitter = max(float(np.min(err)) ** 2, 1e-12)
    n = len(y)
    if init_period is None:
        dtm = float(np.median(np.diff(t)))
        init_period = math.sqrt(n) * dtm
    ppf = period_ppf if period_ppf is not None else default_period_ppf(init_period, n)
    err2 = err * err

    def log_prob_batch(us):
        us = np.atleast_2d(us)
        out = np.full(len(us), -np.inf)
        valid = np.all((us > 0.01) & (us < 99.99), axis=1)
        if valid.any():
            ks, means, diags = [], [], []
            for u in us[valid]:
                p = transform(u, y_mean, y_sigma, jitter, ppf)
                ks.append(params_to_coeffs(kernel, p))
                means.append(p["mean"])
                diags.append(err2 + p["jitter"])
            nll = celerite_nll_batch(t, y, np.array(diags), ks, np.array(means))
            out[valid] = np.where(nll < 1e24, -nll, -np.inf)
        return out

    _, _, u_map = celerite_map_fit(
        t, y, err, kernel=kernel, init_period=init_period,
        max_iter=map_max_iter, period_ppf=period_ppf, return_u=True,
    )
    rng = np.random.default_rng(seed)
    walkers = u_map + 1e-3 * rng.standard_normal((n_walkers, ndim))
    chain = ensemble_sampler_batch(log_prob_batch, walkers, n_steps, rng)
    flat = chain[burn:].reshape(-1, ndim)
    pidx = 3 if kernel == "brownian" else 2
    periods = np.asarray(ppf(np.clip(flat[:, pidx], 0.01, 99.99) / 100.0), float)
    psds = None
    if psd_at is not None:
        psd_at = np.asarray(psd_at, float)
        psds = np.empty((len(flat), len(psd_at)))
        for i, u in enumerate(flat):
            p = transform(np.clip(u, 0.01, 99.99), y_mean, y_sigma, jitter, ppf)
            psds[i] = params_to_coeffs(kernel, p).psd(psd_at)
    return periods, psds
