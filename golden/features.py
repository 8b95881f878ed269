"""Golden ASR feature front end: MFCC chain, VTLN, CMN, deltas.

Capability parity target: reference `btk/feature/` cepstral half +
`asr/feature/` — `PreemphasisFeature`, `HammingFeature`, `SpectralPower`,
`MelFeature`, `LogFeature`, `CepstralFeature` (DCT-II → MFCC), mean
subtraction, delta/stacking, VTLN warping (SURVEY.md §2.1/§2.2 [K]).

Conventions:
  - mel(f) = 2595·log10(1 + f/700)
  - triangular mel filters with centres uniform on the mel axis between
    fmin..fmax, built over rFFT bins (or directly over subband bins — the
    DSR chain feeds beamformed subband power straight into the mel matrix
    without resynthesis)
  - DCT-II, orthonormal, first `num_cepstra` rows
  - VTLN: Kaldi-style piecewise-linear frequency warp applied when placing
    the mel filter edges
  - deltas: regression over ±W frames with edge replication
"""

from __future__ import annotations

import numpy as np


def mel_scale(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def inv_mel_scale(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


def vtln_warp_freq(f, alpha: float, f_low: float, f_high: float):
    """Kaldi-style piecewise-linear VTLN warp of physical frequency.

    Inverse-scale convention: warp factor alpha scales the central band by
    1/alpha, with linear segments pinned at f_low / f_high so the warped
    axis stays a bijection of [0, f_high].
    """
    f = np.asarray(f, dtype=np.float64)
    scale = 1.0 / alpha
    l = f_low * max(1.0, scale)
    h = f_high * min(1.0, scale)
    # Segment slopes pin the endpoints: W(f_low)=f_low, W(f_high)=f_high.
    slope_l = (scale * l - f_low) / (l - f_low) if l > f_low else scale
    slope_r = (f_high - scale * h) / (f_high - h) if h < f_high else scale
    out = scale * f
    lo = f < l
    hi = f > h
    out[lo] = f_low + slope_l * (f[lo] - f_low)
    out[hi] = f_high - slope_r * (f_high - f[hi])
    return out


def mel_filterbank(
    num_mel: int,
    bin_freqs: np.ndarray,
    fmin: float,
    fmax: float,
    vtln_warp: float = 1.0,
) -> np.ndarray:
    """Triangular mel filter matrix over arbitrary bin centre freqs.

    → (num_mel, len(bin_freqs)).  Works for rFFT bins and for subband bins.
    """
    m_lo, m_hi = mel_scale(fmin), mel_scale(fmax)
    centers_mel = np.linspace(m_lo, m_hi, num_mel + 2)
    centers = inv_mel_scale(centers_mel)
    if vtln_warp != 1.0:
        # warp the filter edges in the physical domain (Kaldi convention)
        centers = vtln_warp_freq(centers, vtln_warp, f_low=fmin, f_high=fmax)
        centers = np.clip(centers, fmin, fmax)
    W = np.zeros((num_mel, len(bin_freqs)))
    for i in range(num_mel):
        left, mid, right = centers[i], centers[i + 1], centers[i + 2]
        up = (bin_freqs - left) / max(mid - left, 1e-10)
        down = (right - bin_freqs) / max(right - mid, 1e-10)
        W[i] = np.maximum(0.0, np.minimum(up, down))
    return W


def dct_matrix(num_cepstra: int, num_mel: int) -> np.ndarray:
    """Orthonormal DCT-II rows 0..num_cepstra-1: (num_cepstra, num_mel)."""
    n = np.arange(num_mel)
    k = np.arange(num_cepstra)[:, None]
    C = np.cos(np.pi * k * (2 * n[None, :] + 1) / (2 * num_mel))
    C *= np.sqrt(2.0 / num_mel)
    C[0] *= np.sqrt(0.5)
    return C


def preemphasis(x: np.ndarray, coeff: float = 0.97) -> np.ndarray:
    return np.concatenate([x[:1], x[1:] - coeff * x[:-1]])


def frame_signal(x: np.ndarray, frame_len: int, hop: int) -> np.ndarray:
    """(S,) → (T, frame_len), T = 1 + floor((S - frame_len)/hop); no padding."""
    S = len(x)
    T = max(0, 1 + (S - frame_len) // hop)
    return np.stack([x[t * hop : t * hop + frame_len] for t in range(T)])


def mfcc(
    x: np.ndarray,
    sample_rate: float = 16000.0,
    num_mel: int = 30,
    num_cepstra: int = 13,
    fmin: float = 20.0,
    fmax: float | None = None,
    preemph: float = 0.97,
    frame_len: int = 400,
    hop: int = 160,
    nfft: int = 512,
    vtln_warp: float = 1.0,
) -> np.ndarray:
    """Time-domain MFCC chain → (T, num_cepstra)."""
    fmax = sample_rate / 2 if fmax is None else fmax
    xp = preemphasis(x, preemph)
    frames = frame_signal(xp, frame_len, hop) * np.hamming(frame_len)
    P = np.abs(np.fft.rfft(frames, nfft, axis=-1)) ** 2
    bin_freqs = np.arange(nfft // 2 + 1) * sample_rate / nfft
    W = mel_filterbank(num_mel, bin_freqs, fmin, fmax, vtln_warp)
    mel_e = np.maximum(P @ W.T, 1e-10)
    C = dct_matrix(num_cepstra, num_mel)
    return np.log(mel_e) @ C.T


def mfcc_from_subbands(
    Y: np.ndarray,
    M: int,
    sample_rate: float = 16000.0,
    num_mel: int = 30,
    num_cepstra: int = 13,
    fmin: float = 20.0,
    fmax: float | None = None,
    vtln_warp: float = 1.0,
) -> np.ndarray:
    """MFCC straight from beamformed subband frames Y (T, M//2+1) complex.

    The DSR-chain path: no synthesis/re-analysis round trip (SURVEY.md §3.2).
    """
    fmax = sample_rate / 2 if fmax is None else fmax
    P = np.abs(Y) ** 2
    bin_freqs = np.arange(M // 2 + 1) * sample_rate / M
    W = mel_filterbank(num_mel, bin_freqs, fmin, fmax, vtln_warp)
    mel_e = np.maximum(P @ W.T, 1e-10)
    C = dct_matrix(num_cepstra, num_mel)
    return np.log(mel_e) @ C.T


def cmn(feats: np.ndarray) -> np.ndarray:
    """Per-utterance cepstral mean normalisation."""
    return feats - feats.mean(axis=0, keepdims=True)


def deltas(feats: np.ndarray, window: int = 2) -> np.ndarray:
    """Regression deltas over ±window frames, edges replicated."""
    T = len(feats)
    denom = 2 * sum(d * d for d in range(1, window + 1))
    padded = np.concatenate([feats[:1].repeat(window, 0), feats, feats[-1:].repeat(window, 0)])
    out = np.zeros_like(feats)
    for d in range(1, window + 1):
        out += d * (padded[window + d : window + d + T] - padded[window - d : window - d + T])
    return out / denom


def add_deltas(feats: np.ndarray, window: int = 2) -> np.ndarray:
    """[c, Δc, ΔΔc] stacking → (T, 3·D)."""
    d1 = deltas(feats, window)
    d2 = deltas(d1, window)
    return np.concatenate([feats, d1, d2], axis=1)
