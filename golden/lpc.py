"""Golden LPC / warped-LPC / (warped-)MVDR spectral envelope features.

Capability parity target: reference `asr/feature/` — LPC analysis and the
warped-MVDR spectral envelope of Wölfel & McDonough (warped-frequency LPC
via Levinson-Durbin on a warped autocorrelation, MVDR envelope from the LPC
coefficients via the Musicus recursion) (SURVEY.md §2.2 [K]; BASELINE.json
north_star "MFCC/LPC/warped-MVDR feature extraction").

Definitions:
  - autocorrelation method LPC of order p: solve Toeplitz R a = r via
    Levinson-Durbin; prediction polynomial A(z) = 1 - sum a_i z^-i with
    residual error err.
  - warped autocorrelation: r̃[i] = <x, D^i x> where D is the first-order
    allpass  D(z) = (z^-1 - λ) / (1 - λ z^-1)  (bilinear warping, λ ≈ 0.4595
    approximates the mel scale at 16 kHz).
  - MVDR envelope (Musicus 1985):  S(ω) = err / Σ_{k=-p..p} μ_k e^{-jωk}
    with  μ_k = Σ_{i=0}^{p-k} (p + 1 - k - 2i) b_i b*_{i+k},  k ≥ 0,
    μ_{-k} = μ_k*, where b = A's coefficient vector [1, -a_1, ..., -a_p].
"""

from __future__ import annotations

import numpy as np


def autocorr(x: np.ndarray, order: int) -> np.ndarray:
    """Biased autocorrelation r[0..order]."""
    n = len(x)
    r = np.empty(order + 1)
    for i in range(order + 1):
        r[i] = np.dot(x[: n - i], x[i:]) / n
    return r


def warped_autocorr(x: np.ndarray, order: int, lam: float) -> np.ndarray:
    """Warped autocorrelation via the allpass chain D(z) = (z^-1-λ)/(1-λz^-1).

    y_0 = x;  y_{i+1} = D y_i;  r̃[i] = <x, y_i> / n.
    The allpass recursion: y[t] = λ·(y[t-1]... implemented directly as
        out[t] = prev[t-1] + λ·(out[t-1] - prev[t])
    """
    n = len(x)
    r = np.empty(order + 1)
    prev = x.astype(np.float64).copy()
    r[0] = np.dot(x, prev) / n
    for i in range(1, order + 1):
        out = np.zeros_like(prev)
        # out = D(z) prev : out[t] = -λ prev[t] + prev[t-1] + λ out[t-1]
        for t in range(n):
            out[t] = -lam * prev[t] + (prev[t - 1] if t > 0 else 0.0) + lam * (out[t - 1] if t > 0 else 0.0)
        r[i] = np.dot(x, out) / n
        prev = out
    return r


def levinson(r: np.ndarray) -> tuple[np.ndarray, float]:
    """Levinson-Durbin: r[0..p] → (a[1..p], err).  Predictor x̂_t = Σ a_i x_{t-i}."""
    p = len(r) - 1
    a = np.zeros(p)
    err = r[0]
    for i in range(1, p + 1):
        acc = r[i] - np.dot(a[: i - 1], r[1:i][::-1])
        k = acc / err if err > 0 else 0.0
        a_new = a.copy()
        a_new[i - 1] = k
        a_new[: i - 1] = a[: i - 1] - k * a[: i - 1][::-1]
        a = a_new
        err = err * (1.0 - k * k)
    return a, max(err, 1e-20)


def lpc_envelope(a: np.ndarray, err: float, num_bins: int) -> np.ndarray:
    """All-pole spectrum |err / A(e^{jω})|² on num_bins uniform ω ∈ [0, π]."""
    p = len(a)
    b = np.concatenate([[1.0], -a])
    w = np.linspace(0, np.pi, num_bins)
    A = np.sum(b[None, :] * np.exp(-1j * w[:, None] * np.arange(p + 1)[None, :]), axis=1)
    return err / np.maximum(np.abs(A) ** 2, 1e-20)


def mvdr_envelope(a: np.ndarray, err: float, num_bins: int) -> np.ndarray:
    """Musicus MVDR envelope from LPC coefficients, uniform ω ∈ [0, π]."""
    p = len(a)
    b = np.concatenate([[1.0], -a])
    mu = np.zeros(p + 1, dtype=np.complex128)
    for k in range(p + 1):
        i = np.arange(0, p - k + 1)
        mu[k] = np.sum((p + 1 - k - 2 * i) * b[i] * np.conj(b[i + k]))
    w = np.linspace(0, np.pi, num_bins)
    S = mu[0].real + 2 * np.sum(
        [np.real(mu[k] * np.exp(-1j * w * k)) for k in range(1, p + 1)], axis=0
    )
    return err / np.maximum(S, 1e-20)


def warped_mvdr_cepstra(
    x: np.ndarray,
    order: int = 30,
    lam: float = 0.4595,
    num_bins: int = 129,
    num_cepstra: int = 13,
) -> np.ndarray:
    """One frame → warped-MVDR envelope cepstra (Wölfel front end) [K].

    Envelope is computed on the *warped* frequency axis (the warping is in
    the autocorrelation domain), log-compressed, then DCT-II to cepstra.
    """
    from golden.features import dct_matrix

    r = warped_autocorr(x, order, lam)
    a, err = levinson(r)
    env = mvdr_envelope(a, err, num_bins)
    C = dct_matrix(num_cepstra, num_bins)
    return C @ np.log(np.maximum(env, 1e-20))
