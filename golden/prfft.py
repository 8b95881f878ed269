"""Perfect-reconstruction FFT filterbank (NumPy golden model).

Reference `btk/modulated/` `PerfectReconstructionFFTAnalysisBank` /
`SynthesisBank` (SURVEY.md §2.1 modulated row [K]): a windowed-FFT
(STFT) bank whose analysis/synthesis window pair satisfies the constant
overlap-add identity Σ_t w_a[n−tD]·w_s[n−tD] = 1, so synthesis∘analysis
is EXACT (to float rounding) — unlike the oversampled DFT bank, whose
least-squares prototypes reconstruct to ≈ −80 dB.  Critically sampled at
D = M (rectangular window); the usual PR operating points are D = M/2 or
M/4 with a sqrt-Hann pair.
"""

from __future__ import annotations

import numpy as np


def design_cola_window(M: int, D: int) -> np.ndarray:
    """Self-dual PR window for hop D: sqrt of a periodic Hann, renormalised
    so Σ_t w²[n − tD] ≡ 1 exactly (requires D | M)."""
    assert M % D == 0, "PR-FFT bank needs hop D dividing the window length M"
    if D == M:
        return np.ones(M)
    w2 = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(M) / M)  # periodic Hann
    # exact COLA normalisation: divide by the (D-periodic) overlap sum
    s = np.zeros(M)
    for t in range(-(M // D) + 1, M // D):
        idx = np.arange(M) - t * D
        ok = (idx >= 0) & (idx < M)
        s[ok] += w2[idx[ok]]
    return np.sqrt(w2 / s)


def num_frames(S: int, M: int, D: int) -> int:
    # M/D − 1 extra tail frames: every sample (incl. the last) must receive
    # all M/D overlapping window contributions for the COLA identity
    return int(np.ceil(S / D)) + M // D - 1


def analysis(x: np.ndarray, M: int, D: int, window: np.ndarray | None = None):
    """x: (S,) → (T, M//2+1) complex (frame t covers x[tD − (M−D) .. +M))."""
    if window is None:
        window = design_cola_window(M, D)
    S = x.shape[-1]
    T = num_frames(S, M, D)
    P = M - D
    xp = np.concatenate([np.zeros(P), x, np.zeros(T * D + M - (S + P))])
    frames = np.stack([xp[t * D : t * D + M] for t in range(T)])
    return np.fft.rfft(frames * window, axis=-1)


def synthesis(A: np.ndarray, M: int, D: int, out_len: int,
              window: np.ndarray | None = None) -> np.ndarray:
    """(T, M//2+1) → (out_len,): irfft, window, overlap-add."""
    if window is None:
        window = design_cola_window(M, D)
    T = A.shape[0]
    v = np.fft.irfft(A, M, axis=-1) * window
    y = np.zeros(T * D + M)
    for t in range(T):
        y[t * D : t * D + M] += v[t]
    P = M - D
    return y[P : P + out_len]
