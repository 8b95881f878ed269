"""Golden WPE (weighted prediction error) multi-channel dereverberation.

Capability parity target: the later btk20 lineage's dereverberation module
(SURVEY.md §2.1 "dereverberation" [K], flagged "verify" — implemented to the
standard Nakatani et al. WPE definition).

Per subband k: late reverberation is predicted from frames delayed by Δ
with K_taps-tap multi-channel linear prediction, weighted by the estimated
time-varying source variance λ_t; the prediction is subtracted:
    d[t] = y[t] − G^H ỹ[t−Δ .. t−Δ−K+1]      (per-bin, all channels jointly)
"""

from __future__ import annotations

import numpy as np


def wpe(
    Y: np.ndarray,
    taps: int = 8,
    delay: int = 2,
    iters: int = 3,
    eps: float = 1e-10,
) -> np.ndarray:
    """WPE dereverberation.  Y: (N, T, K) complex → (N, T, K) dereverbed."""
    N, T, K = Y.shape
    D = Y.copy()
    for k in range(K):
        Yk = Y[:, :, k]  # (N, T)
        # build stacked delayed observations: f[t] = vec(Y[:, t-delay-τ]) τ=0..taps-1
        F = np.zeros((N * taps, T), np.complex128)
        for tau in range(taps):
            shift = delay + tau
            F[tau * N : (tau + 1) * N, shift:] = Yk[:, : T - shift]
        Dk = Yk.copy()
        for _ in range(iters):
            lam = np.maximum(np.mean(np.abs(Dk) ** 2, axis=0), eps)  # (T,)
            Fw = F / lam[None, :]
            R = Fw @ np.conj(F.T)                       # (NK, NK)
            P = Fw @ np.conj(Yk.T)                      # (NK, N)
            G = np.linalg.solve(R + eps * np.trace(R).real / len(R) * np.eye(len(R)), P)
            Dk = Yk - np.conj(G.T) @ F
        D[:, :, k] = Dk
    return D
