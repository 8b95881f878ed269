"""Golden modal (spherical-harmonic) beamformer for spherical arrays.

Capability parity target: the reference's modal/spherical-harmonic
eigenbeamformer (SURVEY.md §2.1 beamformer row, "modal/spherical-harmonic
eigenbeamformer for spherical arrays" [K]).

Open-sphere model: a unit plane wave from direction Ω₀ gives mic signals
    p(Ω_q) = Σ_{n=0}^{N} b_n(ka) Σ_{m} Y_nm(Ω_q) Y*_nm(Ω₀),
    b_n(ka) = 4π iⁿ j_n(ka)   (open sphere).
Beamforming: decompose mics → SH coefficients p_nm (pseudo-inverse of the
SH matrix), equalise by 1/b_n (regularised), steer with Y*_nm(Ω_look):
    y = Σ_nm  (p_nm / b_n) Y*_nm(Ω_look) · w_n
"""

from __future__ import annotations

import numpy as np
from scipy.special import sph_harm_y, spherical_jn


def sh_matrix(order: int, thetas: np.ndarray, phis: np.ndarray) -> np.ndarray:
    """Y: (Q, (order+1)²) complex SH values at mic directions (colat, az)."""
    cols = []
    for n in range(order + 1):
        for m in range(-n, n + 1):
            cols.append(sph_harm_y(n, m, thetas, phis))
    return np.stack(cols, axis=1)


def bn_open_sphere(order: int, ka: float) -> np.ndarray:
    """Modal strengths b_n(ka) repeated per m → ((order+1)²,) complex."""
    out = []
    for n in range(order + 1):
        bn = 4 * np.pi * (1j**n) * spherical_jn(n, ka)
        out.extend([bn] * (2 * n + 1))
    return np.asarray(out)


def modal_weights(
    order: int,
    ka: float,
    mic_dirs: np.ndarray,   # (Q, 2) [colatitude, azimuth]
    look_dir: np.ndarray,   # (2,)
    reg: float = 1e-2,
) -> np.ndarray:
    """→ w (Q,) conj-weights: y = w^H p gives the plane-wave-domain output.

    Regularised modal equalisation (|b_n|² + reg) caps white-noise gain at
    high orders where j_n(ka) → 0.
    """
    Y = sh_matrix(order, mic_dirs[:, 0], mic_dirs[:, 1])          # (Q, NM)
    Ypinv = np.linalg.pinv(Y)                                      # (NM, Q)
    bn = bn_open_sphere(order, ka)
    eq = np.conj(bn) / (np.abs(bn) ** 2 + reg)
    y0 = sh_matrix(order, look_dir[:1], look_dir[1:2])[0]          # (NM,)
    # y = Σ_nm eq_nm Y*_nm(look) (Ypinv p)_nm = (stuff)ᴴ p
    w_h = (eq * np.conj(y0)) @ Ypinv                               # (Q,)
    return np.conj(w_h)


def plane_wave_pressure(order: int, ka: float, mic_dirs: np.ndarray, src_dir: np.ndarray) -> np.ndarray:
    """Open-sphere plane-wave response at the mics (order-truncated)."""
    Y = sh_matrix(order, mic_dirs[:, 0], mic_dirs[:, 1])
    y0 = sh_matrix(order, src_dir[:1], src_dir[1:2])[0]
    bn = bn_open_sphere(order, ka)
    return Y @ (bn * np.conj(y0))
