"""Golden post-beamformer single-channel enhancement filters.

Capability parity target: reference `btk/postfilter/` — Zelinski and
McCowan post-filters, APAB, binary masking (SURVEY.md §2.1 [K]).

All operate on multi-channel subband snapshots X (N, T, K) and the
beamformer output Y (T, K); PSDs are recursively smoothed over frames with
factor `alpha`:   φ[t] = α·φ[t-1] + (1-α)·(·).
"""

from __future__ import annotations

import numpy as np


def _smooth(vals: np.ndarray, alpha: float) -> np.ndarray:
    """First-order recursive smoothing along axis 0."""
    out = np.empty_like(vals)
    acc = vals[0]
    out[0] = acc
    for t in range(1, len(vals)):
        acc = alpha * acc + (1 - alpha) * vals[t]
        out[t] = acc
    return out


def zelinski_weights(X: np.ndarray, alpha: float = 0.8, floor: float = 0.1) -> np.ndarray:
    """Zelinski post-filter gain H (T, K).

    H = (2/(N(N-1)) Σ_{i<j} Re φ_ij) / ((1/N) Σ_i φ_ii).
    """
    N, T, K = X.shape
    auto = _smooth(np.mean(np.abs(X) ** 2, axis=0), alpha)  # (T, K)
    cross_inst = np.zeros((T, K))
    npairs = 0
    for i in range(N):
        for j in range(i + 1, N):
            cross_inst += np.real(X[i] * np.conj(X[j]))
            npairs += 1
    cross = _smooth(cross_inst / npairs, alpha)
    H = cross / np.maximum(auto, 1e-12)
    return np.clip(H, floor, 1.0)


def mccowan_weights(
    X: np.ndarray, Gamma: np.ndarray, alpha: float = 0.8, floor: float = 0.1
) -> np.ndarray:
    """McCowan post-filter: Zelinski generalised to a known noise coherence.

    φ̂_ss^{ij} = (Re φ_ij − 0.5·Re Γ_ij·(φ_ii + φ_jj)) / (1 − Re Γ_ij);
    H = mean_{i<j} φ̂_ss^{ij} / mean_i φ_ii.    Gamma: (K, N, N).
    """
    N, T, K = X.shape
    phi_auto = np.stack([_smooth(np.abs(X[i]) ** 2, alpha) for i in range(N)])  # (N, T, K)
    num = np.zeros((T, K))
    npairs = 0
    for i in range(N):
        for j in range(i + 1, N):
            phi_ij = _smooth(np.real(X[i] * np.conj(X[j])), alpha)
            g = np.clip(np.real(Gamma[:, i, j]), -0.99, 0.99)[None, :]
            num += (phi_ij - 0.5 * g * (phi_auto[i] + phi_auto[j])) / (1.0 - g)
            npairs += 1
    den = np.mean(phi_auto, axis=0)
    H = (num / npairs) / np.maximum(den, 1e-12)
    return np.clip(H, floor, 1.0)


def binary_mask(Y_target: np.ndarray, Y_ref: np.ndarray, floor: float = 0.05) -> np.ndarray:
    """Binary masking: keep bins where the target beam dominates the
    reference (e.g. a null-steered) beam (reference binary-mask stage [K])."""
    mask = (np.abs(Y_target) >= np.abs(Y_ref)).astype(np.float64)
    return np.maximum(mask, floor)


def apab_weights(Y: np.ndarray, Z: np.ndarray, alpha: float = 0.8, floor: float = 0.1) -> np.ndarray:
    """APAB post-filter: Wiener gain from beamformer output PSD vs the
    blocked (noise-reference) channel PSD.  Y, Z: (T, K)."""
    phi_y = _smooth(np.abs(Y) ** 2, alpha)
    phi_z = _smooth(np.abs(Z) ** 2, alpha)
    H = 1.0 - phi_z / np.maximum(phi_y, 1e-12)
    return np.clip(H, floor, 1.0)


def lefkimmiatis_weights(
    X: np.ndarray,
    Gamma: np.ndarray,
    w: np.ndarray,
    alpha: float = 0.8,
    floor: float = 0.1,
) -> np.ndarray:
    """Lefkimmiatis(-Maragos) post-filter gain H (T, K) (reference
    `btk/postfilter/` [K], SURVEY.md §2.1).

    McCowan's coherence-corrected pairwise speech-PSD estimate, but with
    the Wiener gain formed from the noise PSD *at the beamformer output*
    (the superdirective beamformer already attenuates diffuse noise by
    w^H Γ w, which McCowan/Zelinski ignore):

        φ̂_ss  = mean_{i<j} (Re φ_ij − ½·Re Γ_ij·(φ_ii+φ_jj)) / (1 − Re Γ_ij)
        φ̂_nn  = max(mean_i φ_ii − φ̂_ss, 0)        (diffuse noise at a mic)
        H     = φ̂_ss / (φ̂_ss + (w^H Γ w)·φ̂_nn)

    X: (N, T, K);  Gamma: (K, N, N);  w: (K, N) beamformer weights.
    """
    N, T, K = X.shape
    phi_auto = np.stack([_smooth(np.abs(X[i]) ** 2, alpha) for i in range(N)])  # (N, T, K)
    num = np.zeros((T, K))
    npairs = 0
    for i in range(N):
        for j in range(i + 1, N):
            phi_ij = _smooth(np.real(X[i] * np.conj(X[j])), alpha)
            g = np.clip(np.real(Gamma[:, i, j]), -0.99, 0.99)[None, :]
            num += (phi_ij - 0.5 * g * (phi_auto[i] + phi_auto[j])) / (1.0 - g)
            npairs += 1
    phi_ss = np.maximum(num / npairs, 0.0)                       # (T, K)
    phi_nn = np.maximum(np.mean(phi_auto, axis=0) - phi_ss, 0.0)
    wgw = np.real(np.einsum("kn,knm,km->k", np.conj(w), Gamma.astype(complex), w))
    wgw = np.maximum(wgw, 1e-6)[None, :]                         # (1, K)
    H = phi_ss / np.maximum(phi_ss + wgw * phi_nn, 1e-12)
    return np.clip(H, floor, 1.0)
