"""Golden synthetic multi-channel room simulator.

SURVEY.md §7 step 1: no corpus ships in this environment, so evaluation data
is synthesised with known geometry/transcripts.  Model: point source with
exact fractional delays per microphone (frequency-domain delay), optional
scaled image-source reflections, plus independent sensor noise and optional
diffuse (spherically isotropic) noise.

All arrays are float64 NumPy; this module is also used to generate the eval
corpora for WER gates, so it must stay deterministic given an rng.
"""

from __future__ import annotations

import numpy as np


def frac_delay(x: np.ndarray, delay_samples: float) -> np.ndarray:
    """Delay x by a (possibly fractional) number of samples, FFT method."""
    n = len(x)
    nfft = 1 << int(np.ceil(np.log2(2 * n)))
    X = np.fft.rfft(x, nfft)
    f = np.arange(len(X)) / nfft  # cycles/sample
    y = np.fft.irfft(X * np.exp(-2j * np.pi * f * delay_samples), nfft)
    return y[:n]


def steering_delays(
    mic_positions: np.ndarray, source_pos: np.ndarray, sound_speed: float, sample_rate: float
) -> np.ndarray:
    """Per-mic propagation delay in samples, relative to the array origin.

    Near-field (point-source) model: τ_n = (|p_n - s| - |s|) / c.
    """
    d = np.linalg.norm(mic_positions - source_pos[None, :], axis=1)
    d0 = np.linalg.norm(source_pos)
    return (d - d0) / sound_speed * sample_rate


def simulate(
    source: np.ndarray,
    mic_positions: np.ndarray,
    source_pos: np.ndarray,
    sample_rate: float = 16000.0,
    sound_speed: float = 343.0,
    snr_db: float | None = 20.0,
    diffuse_snr_db: float | None = None,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Render `source` at `source_pos` onto an array.  → (N, S) float64.

    snr_db: per-channel white sensor noise SNR.  diffuse_snr_db: optional
    spherically-diffuse noise built by averaging many far-field white plane
    waves (used by MVDR tests, since Γ_diffuse is its noise model).
    """
    rng = np.random.default_rng(0) if rng is None else rng
    N = len(mic_positions)
    S = len(source)
    taus = steering_delays(mic_positions, source_pos, sound_speed, sample_rate)
    out = np.stack([frac_delay(source, t) for t in taus])
    sig_pow = np.mean(source**2) + 1e-30
    if diffuse_snr_db is not None:
        diff = np.zeros((N, S))
        n_dirs = 64
        dirs = _fibonacci_sphere(n_dirs)
        for u in dirs:
            w = rng.standard_normal(S)
            dl = -(mic_positions @ u) / sound_speed * sample_rate
            for i in range(N):
                diff[i] += frac_delay(w, dl[i])
        diff *= np.sqrt(sig_pow / np.mean(diff**2) * 10 ** (-diffuse_snr_db / 10))
        out = out + diff
    if snr_db is not None:
        noise = rng.standard_normal((N, S))
        noise *= np.sqrt(sig_pow * 10 ** (-snr_db / 10))
        out = out + noise
    return out


def _fibonacci_sphere(n: int) -> np.ndarray:
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5**0.5) * i
    return np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)], axis=1
    )
