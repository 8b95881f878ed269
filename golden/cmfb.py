"""Golden cosine-modulated filterbank (CMFB) — the de Haan-lineage cosine
bank of the reference's `btk/modulated/` (SURVEY.md §2.1 [K]).

Near-perfect-reconstruction pseudo-QMF: M real subbands, critically
sampled (decimation M), prototype length L = 2·m·M, analysis/synthesis
filters
    h_k[n] = 2 h[n] cos( (π/M)(k+½)(n − (L−1)/2) + (−1)^k π/4 )
    f_k[n] = 2 h[n] cos( (π/M)(k+½)(n − (L−1)/2) − (−1)^k π/4 )
(the phase pair cancels adjacent-band aliasing).  The prototype is a
Kaiser lowpass with its cutoff bisected to the power-complementary
crossover |H(π/2M)| = 1/√2.  Overall delay and gain are calibrated at
design time by passing an impulse through the bank — stored with the
design, so reconstruction needs no convention guesswork.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class CmfbDesign:
    ha: np.ndarray   # (M, L) analysis filters
    hs: np.ndarray   # (M, L) synthesis filters
    M: int
    delay: int
    gain: float


def _prototype(M: int, m: int, beta: float) -> np.ndarray:
    L = 2 * m * M
    n = np.arange(L)
    c = (L - 1) / 2.0

    def proto(cut):
        h = np.sinc(cut * (n - c) / M) * np.kaiser(L, beta)
        return h / (h.sum() + 1e-30)

    lo, hi = 0.3, 0.7
    for _ in range(40):
        mid = 0.5 * (lo + hi)
        h = proto(mid)
        H = np.abs(np.fft.rfft(h, 64 * L))
        w = np.linspace(0, np.pi, len(H))
        val = H[np.argmin(np.abs(w - np.pi / (2 * M)))] / H[0]
        if val > np.sqrt(0.5):
            hi = mid
        else:
            lo = mid
    return proto(0.5 * (lo + hi))


def _raw_analysis(x: np.ndarray, ha: np.ndarray, M: int) -> np.ndarray:
    Mb, L = ha.shape
    S = len(x)
    T = -(-(S + L) // M) + ha.shape[1] // M
    xp = np.concatenate([np.zeros(L - 1), x, np.zeros(T * M + L - S)])
    out = np.empty((T, Mb))
    rev = ha[:, ::-1]
    for t in range(T):
        out[t] = rev @ xp[t * M : t * M + L]
    return out


def _raw_synthesis(U: np.ndarray, hs: np.ndarray, M: int) -> np.ndarray:
    T, Mb = U.shape
    L = hs.shape[1]
    y = np.zeros((T - 1) * M + L)
    for t in range(T):
        y[t * M : t * M + L] += U[t] @ hs
    return y


def design(M: int, m: int = 8, beta: float = 9.0) -> CmfbDesign:
    h = _prototype(M, m, beta)
    L = len(h)
    n = np.arange(L)
    ks = np.arange(M)[:, None]
    phase = (np.pi / M) * (ks + 0.5) * (n[None, :] - (L - 1) / 2)
    theta = ((-1.0) ** ks) * (np.pi / 4)
    ha = 2 * h[None, :] * np.cos(phase + theta)
    hs = 2 * h[None, :] * np.cos(phase - theta)
    # calibrate delay & gain with an impulse
    imp = np.zeros(4 * L)
    imp[2 * L] = 1.0
    y = _raw_synthesis(_raw_analysis(imp, ha, M), hs, M)
    k = int(np.argmax(np.abs(y)))
    gain = y[k]
    # y index k corresponds to x index 2L: reconstruction delay in y-coords
    delay = k - 2 * L
    return CmfbDesign(ha, hs, M, delay, float(gain))


def analysis(x: np.ndarray, d: CmfbDesign) -> np.ndarray:
    """(S,) → (T, M) real subbands (critically sampled)."""
    return _raw_analysis(x, d.ha, d.M)


def synthesis(U: np.ndarray, d: CmfbDesign, out_len: int) -> np.ndarray:
    """(T, M) → (out_len,) with design delay/gain compensated."""
    y = _raw_synthesis(U, d.hs, d.M) / d.gain
    return y[d.delay : d.delay + out_len]
