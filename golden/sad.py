"""Golden speech-activity detection (VAD).

Capability parity target: reference `btk/sad/` — energy and
likelihood-ratio VAD stages (SURVEY.md §2.1 [K]).
"""

from __future__ import annotations

import numpy as np


def energy_vad(
    P_frames: np.ndarray, threshold_db: float = 6.0, hangover: int = 8
) -> np.ndarray:
    """Energy VAD with noise-floor tracking and hangover.

    P_frames: (T,) frame powers → (T,) {0,1}.  Noise floor = running
    minimum-controlled average; active when power > floor + threshold_db.
    """
    T = len(P_frames)
    logp = 10 * np.log10(np.maximum(P_frames, 1e-12))
    floor = logp[0]
    out = np.zeros(T, np.int32)
    hang = 0
    for t in range(T):
        # slow rise, fast fall floor tracking
        if logp[t] < floor:
            floor = 0.9 * floor + 0.1 * logp[t]
        else:
            floor = floor + 0.05
        if logp[t] > floor + threshold_db:
            out[t] = 1
            hang = hangover
        elif hang > 0:
            out[t] = 1
            hang -= 1
    return out


def sohn_vad(
    P: np.ndarray,
    noise_psd: np.ndarray,
    prior_snr_alpha: float = 0.98,
    threshold: float = 0.0,
    hangover: int = 8,
) -> tuple[np.ndarray, np.ndarray]:
    """Sohn likelihood-ratio VAD on subband powers.

    P: (T, K) |X|²;  noise_psd: (K,).  Per frame the geometric-mean log
    likelihood ratio under Gaussian H1/H0 with decision-directed prior SNR:
        Λ = mean_k [ γξ/(1+ξ) − ln(1+ξ) ],  γ = P/φ_n (posterior SNR).
    → (decisions (T,), llr (T,)).
    """
    T, K = P.shape
    xi_prev = np.ones(K)
    llr = np.empty(T)
    dec = np.zeros(T, np.int32)
    gain_prev = np.ones(K)
    hang = 0
    for t in range(T):
        gamma = P[t] / np.maximum(noise_psd, 1e-12)
        xi = prior_snr_alpha * (gain_prev**2) * gamma + (1 - prior_snr_alpha) * np.maximum(
            gamma - 1, 0
        )
        xi = np.maximum(xi, 1e-3)
        llr[t] = np.mean(gamma * xi / (1 + xi) - np.log1p(xi))
        gain_prev = xi / (1 + xi)
        if llr[t] > threshold:
            dec[t] = 1
            hang = hangover
        elif hang > 0:
            dec[t] = 1
            hang -= 1
    return dec, llr
