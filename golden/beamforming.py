"""Golden subband-domain beamformers: DS, superdirective MVDR, GSC-NLMS.

Capability parity target: reference `btk/beamformer/` — `SubbandDS`,
`SubbandMVDR` (superdirective with diffuse-field coherence), `SubbandGSC`
with NLMS active weights (SURVEY.md §2.1 [K]; BASELINE.json configs 1-3).

All operate on analysis-bank outputs X with shape (N_channels, T, K) where
K = M//2 + 1 subband bins with centre frequencies f_k = k · fs / M.

Weight conventions: beamformer output y[t,k] = w_k^H X[:,t,k]; distortionless
means w_k^H v_k = 1 with v_k the steering (array-manifold) vector
v_k[n] = exp(-2j·pi·f_k·τ_n) for per-mic delays τ_n seconds.
"""

from __future__ import annotations

import numpy as np


def subband_freqs(M: int, sample_rate: float) -> np.ndarray:
    return np.arange(M // 2 + 1) * sample_rate / M


def steering_vectors(taus_sec: np.ndarray, M: int, sample_rate: float) -> np.ndarray:
    """Array manifold.  taus_sec: (N,) per-mic delays → (K, N) complex."""
    f = subband_freqs(M, sample_rate)
    return np.exp(-2j * np.pi * f[:, None] * taus_sec[None, :])


def ds_weights(v: np.ndarray) -> np.ndarray:
    """Delay-and-sum: w_k = v_k / N  (distortionless: w^H v = 1)."""
    N = v.shape[-1]
    return v / N


def diffuse_coherence(
    mic_positions: np.ndarray, M: int, sample_rate: float, sound_speed: float
) -> np.ndarray:
    """Spherically-diffuse noise coherence Γ_ij(f_k) = sinc(2π f d_ij / c).

    → (K, N, N) real.  (sinc here is sin(x)/x, NOT numpy's normalised sinc.)
    """
    d = np.linalg.norm(mic_positions[:, None, :] - mic_positions[None, :, :], axis=-1)
    f = subband_freqs(M, sample_rate)
    x = 2 * np.pi * f[:, None, None] * d[None] / sound_speed
    return np.where(x == 0, 1.0, np.sin(np.where(x == 0, 1.0, x)) / np.where(x == 0, 1.0, x))


def mvdr_weights(v: np.ndarray, Gamma: np.ndarray, loading: float = 1e-2) -> np.ndarray:
    """Superdirective MVDR: w_k = Γl⁻¹ v / (v^H Γl⁻¹ v), Γl = Γ + λI.

    v: (K, N), Gamma: (K, N, N) → (K, N) complex.
    """
    K, N = v.shape
    Gl = Gamma + loading * np.eye(N)[None]
    w = np.empty_like(v)
    for k in range(K):
        gv = np.linalg.solve(Gl[k], v[k])
        w[k] = gv / (np.conj(v[k]) @ gv)
    return w


def blocking_matrix(v: np.ndarray) -> np.ndarray:
    """Orthonormal basis of the complement of v_k per bin → (K, N, N-1).

    Closed-form Householder construction (deterministic, identical in the
    JAX implementation): with u = v/||v|| + φ e0, φ = v0/|v0| (phase of the
    first element), H = I - 2 u u^H / (u^H u) is Hermitian unitary with
    H v ∝ e0, so columns 1..N-1 of H form an orthonormal basis of v^⊥.
    """
    K, N = v.shape
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    v0 = vn[:, 0]
    phi = np.where(np.abs(v0) > 1e-12, v0 / np.maximum(np.abs(v0), 1e-30), 1.0)
    u = vn.copy()
    u[:, 0] += phi
    uu = np.sum(np.abs(u) ** 2, axis=1)
    H = np.eye(N, dtype=complex)[None] - 2 * u[:, :, None] * np.conj(u[:, None, :]) / uu[:, None, None]
    return H[:, :, 1:]


def gsc_nlms(
    X: np.ndarray,
    wq: np.ndarray,
    B: np.ndarray,
    mu: float = 0.1,
    eps: float = 1e-6,
    wa_norm_cap: float = 10.0,
) -> tuple[np.ndarray, np.ndarray]:
    """GSC with NLMS active weights (reference `SubbandGSC` [K]).

    X: (N, T, K);  wq: (K, N) quiescent;  B: (K, N, N-1) blocking.
    Per frame t, per bin k:
        yc = wq_k^H X[:,t,k]                 (fixed beamformer)
        z  = B_k^H X[:,t,k]                  (blocked noise refs, N-1)
        y  = yc - wa_k^H z                   (output)
        wa_k += mu * z * conj(y) / (||z||² + eps)   (NLMS, then norm cap)
    Returns (Y, wa_final) with Y: (T, K).
    """
    N, T, K = X.shape
    wa = np.zeros((K, N - 1), dtype=complex)
    Y = np.empty((T, K), dtype=complex)
    for t in range(T):
        x = X[:, t, :]  # (N, K)
        for k in range(K):
            yc = np.vdot(wq[k], x[:, k])        # wq^H x
            z = np.conj(B[k]).T @ x[:, k]       # (N-1,)
            y = yc - np.vdot(wa[k], z)
            Y[t, k] = y
            wa[k] = wa[k] + mu * z * np.conj(y) / (np.real(np.vdot(z, z)) + eps)
            nrm = np.linalg.norm(wa[k])
            if nrm > wa_norm_cap:
                wa[k] *= wa_norm_cap / nrm
    return Y, wa


def apply_weights(X: np.ndarray, w: np.ndarray) -> np.ndarray:
    """y[t,k] = w_k^H X[:,t,k].   X: (N, T, K), w: (K, N) → (T, K)."""
    return np.einsum("kn,ntk->tk", np.conj(w), X)


def gsc_maxkurt(
    X: np.ndarray,
    wq: np.ndarray,
    B: np.ndarray,
    mu: float = 0.1,
    iters: int = 50,
    wa_norm_cap: float = 2.0,
    decay: float = 0.1,
) -> tuple[np.ndarray, np.ndarray]:
    """GSC with active weights adapted by batch gradient ascent on the
    normalised kurtosis of the output — the maximum-negentropy / maximum-
    kurtosis beamformer of Kumatani et al. (reference `SubbandMMI` [K],
    SURVEY.md §2.1).  Speech is super-Gaussian, so maximising output
    kurtosis under the distortionless constraint (enforced structurally by
    the GSC: w = wq − B·wa with B ⟂ v) recovers the target and cancels
    interference, without needing a noise-only coherence model.

    Per bin k, over the whole utterance (batch adaptation, as upstream):
        y_t = wq_k^H x_t − wa_k^H z_t,   z_t = B_k^H x_t
        J(wa) = E|y|⁴ / (E|y|²)²                (scale-invariant kurtosis)
        ∇_{wa*} J = −2·E[|y|² y* z]/P² + 2·(A/P³)·E[y* z]
                    with P = E|y|², A = E|y|⁴
        wa ← wa + (μ/(1+i·decay))·∇/||∇||      (normalised, decaying step —
                    the raw gradient magnitude varies by orders of
                    magnitude across bins and overshoots)
        then ||wa|| capped (regularisation).

    X: (N, T, K);  wq: (K, N);  B: (K, N, N-1).
    Returns (Y, wa_final) with Y: (T, K) computed with the final weights.
    """
    N, T, K = X.shape
    eps = 1e-12
    wa = np.zeros((K, N - 1), dtype=complex)
    for k in range(K):
        z = np.conj(B[k]).T @ X[:, :, k]          # (N-1, T)
        yq = np.conj(wq[k]) @ X[:, :, k]          # (T,)
        for it in range(iters):
            y = yq - np.conj(wa[k]) @ z           # (T,)
            ay2 = np.abs(y) ** 2
            P = ay2.mean()
            A = (ay2 ** 2).mean()
            e_y2yz = np.mean((ay2 * np.conj(y))[None, :] * z, axis=1)  # E[|y|² y* z]
            e_yz = np.mean(np.conj(y)[None, :] * z, axis=1)            # E[y* z]
            g = -2.0 * e_y2yz / max(P * P, eps) + (2.0 * A / max(P ** 3, eps)) * e_yz
            step = mu / (1.0 + it * decay)
            wa[k] = wa[k] + step * g / (np.linalg.norm(g) + eps)
            nrm = np.linalg.norm(wa[k])
            if nrm > wa_norm_cap:
                wa[k] *= wa_norm_cap / nrm
    Y = np.empty((T, K), dtype=complex)
    for k in range(K):
        z = np.conj(B[k]).T @ X[:, :, k]
        Y[:, k] = np.conj(wq[k]) @ X[:, :, k] - np.conj(wa[k]) @ z
    return Y, wa
