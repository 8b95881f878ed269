"""Golden time-delay estimation (GCC-PHAT) and source localization.

Capability parity target: reference `btk/tde/` (`TDEstimator`, GCC-PHAT
cross-correlation with interpolated sub-sample peak) and
`btk/localization/` (SRP-PHAT grid search; least-squares position solvers)
(SURVEY.md §2.1 [K]; BASELINE.json config 3).
"""

from __future__ import annotations

import numpy as np


def gcc_phat(
    x1: np.ndarray,
    x2: np.ndarray,
    sample_rate: float,
    max_tau: float | None = None,
    interp: int = 4,
) -> tuple[float, np.ndarray, np.ndarray]:
    """GCC-PHAT TDOA of x2 relative to x1 (positive = x2 lags).

    → (tau_seconds, cc, lags_seconds) with parabolic sub-sample peak
    interpolation.
    """
    n = len(x1) + len(x2)
    nfft = 1 << int(np.ceil(np.log2(n)))
    X1 = np.fft.rfft(x1, nfft)
    X2 = np.fft.rfft(x2, nfft)
    R = X1 * np.conj(X2)
    R /= np.maximum(np.abs(R), 1e-15)
    cc = np.fft.irfft(R, interp * nfft)
    max_shift = interp * nfft // 2
    if max_tau is not None:
        max_shift = min(int(interp * sample_rate * max_tau), max_shift)
    cc = np.concatenate([cc[-max_shift:], cc[: max_shift + 1]])
    lags = np.arange(-max_shift, max_shift + 1) / (interp * sample_rate)
    k = int(np.argmax(cc))
    # parabolic interpolation around the peak
    if 0 < k < len(cc) - 1:
        y0, y1, y2 = cc[k - 1], cc[k], cc[k + 1]
        denom = y0 - 2 * y1 + y2
        delta = 0.5 * (y0 - y2) / denom if abs(denom) > 1e-12 else 0.0
    else:
        delta = 0.0
    tau = (k - max_shift + delta) / (interp * sample_rate)
    return -tau, cc, lags


def gcc_phat_subband(
    Y1: np.ndarray, Y2: np.ndarray, M: int, sample_rate: float, interp: int = 8
) -> float:
    """GCC-PHAT from subband snapshots (T, K) — the streaming form used by
    the tracking front end (feeds from the analysis filterbank).
    """
    R = np.sum(Y1 * np.conj(Y2), axis=0)  # (K,)
    R /= np.maximum(np.abs(R), 1e-15)
    cc = np.fft.irfft(R, interp * M)
    half = interp * M // 2
    cc = np.concatenate([cc[-half:], cc[:half]])
    k = int(np.argmax(cc))
    if 0 < k < len(cc) - 1:
        y0, y1, y2 = cc[k - 1], cc[k], cc[k + 1]
        denom = y0 - 2 * y1 + y2
        delta = 0.5 * (y0 - y2) / denom if abs(denom) > 1e-12 else 0.0
    else:
        delta = 0.0
    # cc lag resolution: bins spaced fs/M, irfft length interp*M
    # → time step 1/(interp*fs); sign convention matches gcc_phat.
    return -(k - half + delta) / (interp * sample_rate)


def pair_tdoas(
    x: np.ndarray, pairs: list[tuple[int, int]], sample_rate: float, max_tau: float
) -> np.ndarray:
    """GCC-PHAT TDOA for each mic pair.  x: (N, S) → (P,) seconds."""
    return np.asarray(
        [gcc_phat(x[i], x[j], sample_rate, max_tau)[0] for i, j in pairs]
    )


def expected_tdoas(
    pos: np.ndarray, mics: np.ndarray, pairs: list[tuple[int, int]], c: float
) -> np.ndarray:
    """h(pos): TDOA of mic j relative to mic i for each pair (seconds)."""
    d = np.linalg.norm(mics - pos[None, :], axis=1)
    return np.asarray([(d[j] - d[i]) / c for i, j in pairs])


def srp_phat(
    x: np.ndarray,
    mics: np.ndarray,
    grid: np.ndarray,
    sample_rate: float,
    c: float = 343.0,
    nfft: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Steered-response-power PHAT over candidate positions.

    x: (N, S); grid: (G, 3) → (best_position (3,), power (G,)).
    Implemented in the frequency domain: P(g) = Σ_pairs Re Σ_f
    Φ_ij(f) e^{jω τ_ij(g)} with Φ the PHAT-normalised cross-spectrum.
    """
    N, S = x.shape
    nfft = nfft or (1 << int(np.ceil(np.log2(S))))
    X = np.fft.rfft(x, nfft, axis=1)
    f = np.arange(X.shape[1]) * sample_rate / nfft
    pairs = [(i, j) for i in range(N) for j in range(i + 1, N)]
    power = np.zeros(len(grid))
    Phi = {}
    for (i, j) in pairs:
        R = X[i] * np.conj(X[j])
        Phi[(i, j)] = R / np.maximum(np.abs(R), 1e-15)
    for g, pos in enumerate(grid):
        taus = expected_tdoas(pos, mics, pairs, c)
        for (i, j), tau in zip(pairs, taus):
            power[g] += np.real(np.sum(Phi[(i, j)] * np.exp(2j * np.pi * f * tau)))
    return grid[int(np.argmax(power))], power


def ls_position(
    tdoas: np.ndarray,
    mics: np.ndarray,
    pairs: list[tuple[int, int]],
    c: float = 343.0,
    iters: int = 20,
    x0: np.ndarray | None = None,
) -> np.ndarray:
    """Gauss-Newton least-squares position from pairwise TDOAs."""
    x = np.asarray(x0 if x0 is not None else mics.mean(0) + np.array([0.0, 1.0, 0.0]))
    for _ in range(iters):
        d = np.linalg.norm(mics - x[None, :], axis=1)
        h = np.asarray([(d[j] - d[i]) / c for i, j in pairs])
        # Jacobian: ∂τ_ij/∂x = (u_j - u_i)/c with u_k = (x - m_k)/|x - m_k|
        u = (x[None, :] - mics) / np.maximum(d[:, None], 1e-9)
        J = np.stack([(u[j] - u[i]) / c for i, j in pairs])
        r = tdoas - h
        dx, *_ = np.linalg.lstsq(J, r, rcond=None)
        x = x + dx
        if np.linalg.norm(dx) < 1e-6:
            break
    return x


def sx_position(tdoas0: np.ndarray, mics: np.ndarray, c: float = 343.0) -> np.ndarray:
    """Closed-form spherical-intersection (SX) source localisation
    (Schau-Robinson / Smith-Abel; reference `btk/localization/` [K],
    SURVEY.md §2.1 "spherical-intersection / least-squares position
    solvers").

    tdoas0: (N-1,) TDOAs of mics 1..N-1 relative to mic 0, i.e.
    tdoas0[i-1] = (||x − m_i|| − ||x − m_0||) / c (the `expected_tdoas`
    convention for pairs (0, i)).  mics: (N, 3).  Returns x (3,).

    With mic 0 translated to the origin and range differences d = c·τ:
        m_iᵀ x + d_i·Rs = (||m_i||² − d_i²)/2 =: δ_i,    Rs = ||x||
    ⇒ x(Rs) = a − Rs·b with a = M⁺δ, b = M⁺d, and the spherical
    constraint ||x(Rs)|| = Rs gives the quadratic
        (bᵀb − 1)·Rs² − 2aᵀb·Rs + aᵀa = 0.
    Of the real non-negative roots, the one whose solution best satisfies
    ||x|| = Rs is returned.
    """
    m0 = mics[0]
    M = mics[1:] - m0[None, :]                    # (P, 3)
    d = c * np.asarray(tdoas0, dtype=float)       # (P,)
    delta = 0.5 * (np.sum(M**2, axis=1) - d**2)
    W = np.linalg.pinv(M)                         # (3, P)
    a = W @ delta
    b = W @ d
    A = float(b @ b) - 1.0
    Bq = -2.0 * float(a @ b)
    Cq = float(a @ a)
    if abs(A) < 1e-9:                             # degenerate → linear
        roots = [Cq / max(-Bq, 1e-12)]
    else:
        disc = max(Bq * Bq - 4.0 * A * Cq, 0.0)
        roots = [(-Bq + s * np.sqrt(disc)) / (2.0 * A) for s in (+1.0, -1.0)]
    best, best_res = None, np.inf
    for Rs in roots:
        Rs = max(Rs, 0.0)
        x = a - Rs * b
        res = abs(np.linalg.norm(x) - Rs)
        if res < best_res:
            best, best_res = x, res
    return best + m0
