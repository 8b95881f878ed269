"""Golden subband acoustic echo cancellation + voice-prompt cancellation.

Capability parity target: reference `btk/aec/` (NLMS and Kalman-filter AEC
per subband) and `btk/cancelVP/` (NLMS voice-prompt canceller)
(SURVEY.md §2.1 [K]).

Model per subband k: mic D[t,k] = echo(w^H f[t,k]) + near-end;
f[t,k] = last La far-end frames (multi-tap subband filter).
"""

from __future__ import annotations

import numpy as np


def nlms_aec(
    D: np.ndarray,
    F: np.ndarray,
    taps: int = 4,
    mu: float = 0.5,
    eps: float = 1e-6,
) -> tuple[np.ndarray, np.ndarray]:
    """Subband NLMS echo canceller.  D, F: (T, K) → (E (T, K), W (K, taps))."""
    T, K = D.shape
    W = np.zeros((K, taps), np.complex128)
    hist = np.zeros((K, taps), np.complex128)
    E = np.empty_like(D)
    for t in range(T):
        hist = np.roll(hist, 1, axis=1)
        hist[:, 0] = F[t]
        yhat = np.sum(np.conj(W) * hist, axis=1)
        e = D[t] - yhat
        E[t] = e
        norm = np.sum(np.abs(hist) ** 2, axis=1) + eps
        W += mu * hist * np.conj(e)[:, None] / norm[:, None]
    return E, W


def kalman_aec(
    D: np.ndarray,
    F: np.ndarray,
    taps: int = 4,
    q: float = 1e-4,
    r0: float = 1e-2,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-subband diagonal-covariance Kalman AEC (random-walk echo path).

    State w_k (taps,); observation d = w^H f + v.  Diagonal state covariance
    approximation keeps it O(taps) per bin (the reference's Kalman AEC [K]).
    """
    T, K = D.shape
    W = np.zeros((K, taps), np.complex128)
    P = np.full((K, taps), 0.1)
    hist = np.zeros((K, taps), np.complex128)
    E = np.empty_like(D)
    for t in range(T):
        hist = np.roll(hist, 1, axis=1)
        hist[:, 0] = F[t]
        P = P + q
        yhat = np.sum(np.conj(W) * hist, axis=1)
        e = D[t] - yhat
        E[t] = e
        S = np.sum(P * np.abs(hist) ** 2, axis=1) + r0
        gain = P * hist / S[:, None]  # per-tap Kalman gain (complex-LMS form)
        W = W + gain * np.conj(e)[:, None]
        P = np.maximum(P * (1.0 - P * np.abs(hist) ** 2 / S[:, None]), 1e-8)
    return E, W
