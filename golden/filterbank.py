"""Golden oversampled DFT analysis/synthesis filterbank (polyphase form).

Capability parity target: the reference's `OverSampledDFTAnalysisBank` /
`OverSampledDFTSynthesisBank` (SURVEY.md §2.1 "modulated", provenance [K];
reference tree unavailable — see SURVEY.md §0).  Parameters follow the same
(M, m, r) convention: M subbands, prototype length L = m*M, decimation
D = M / r (r = oversampling factor).

Conventions (the single source of truth for the whole framework):

  Let hf[0..L-1] be the analysis prototype (a *window*, applied in ascending
  time — correlation orientation, not convolution) and xp the input padded
  with P = L - D zeros on the left, so frame t consumes D new samples and
  frame 0 ends on x[0:D].

  Analysis  : A_t[k] = sum_i hf[i] * xp[t*D + i] * exp(-2j*pi*k*i/M)
              computed as polyphase fold u_t[p] = sum_q hf[qM+p] xp[tD+qM+p]
              followed by an M-point rFFT (bins k = 0..M/2).
  Synthesis : v_t = irfft(A_t, M);  y[t*D + i] += gf[i] * v_t[i mod M]
              (overlap-add), then slice off the pad and design delay.

  Summing all M bins cancels cross-residue alias terms exactly, so the
  end-to-end response is T(s,u) = sum_t gf[s-tD] hf[u-tD] restricted to
  u ≡ s (mod M).  PR ⇔ for every residue τ = s mod D and every lag
  d = s - u ∈ M·Z:   sum_{j ≡ τ (D)} gf[j] hf[j-d] = δ[d - Δ].
  Because both prototypes are applied in the same (window) orientation, the
  system delay is Δ = center(gf) - center(hf): with both centered at L/2 the
  natural delay is Δ = 0 *in padded coordinates* (the left pad P supplies
  the causal latency; a streaming implementation sees L-D samples latency).

Design (matches the intent of the de Haan least-squares designs the
reference ships as coefficient files, e.g. h-M256-m4-r1.txt [K]):
  - hf: square-root raised-cosine with band edge pi/M (so the *product*
    response hf·gf is Nyquist(M) — the zero-inter-lag-interference
    condition), mildly windowed, centered at L/2.
  - gf: regularised least squares on the PR system above, trading total
    response error against stopband leakage beyond ω_s ≈ (1+β)π/M.
  - optional alternating (joint) refinement of both prototypes — required
    for critically sampled banks (r = 1), where exact PR is impossible for
    DFT modulation and only ≈ -35 dB total response error is achievable
    (the same fundamental limit the reference's r=1 prototypes face [K]).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "design_analysis_prototype",
    "design_synthesis_prototype",
    "design_prototypes",
    "pr_error_db",
    "analysis",
    "synthesis",
]


def _sqrt_raised_cosine(L: int, M: int, rolloff: float, center: int) -> np.ndarray:
    """Square-root raised-cosine lowpass, band edge pi/M, sampled at n-center.

    Built by dense frequency sampling + IDFT — exact spectral square root of
    a raised cosine, so h*h (correlation) is Nyquist(M) up to truncation.
    """
    NF = 64 * L
    w = np.abs(np.fft.fftfreq(NF) * 2 * np.pi)
    wc = np.pi / M
    lo, hi = wc * (1 - rolloff), wc * (1 + rolloff)
    P = np.where(w <= lo, 1.0, np.where(w >= hi, 0.0, 0.5 * (1 + np.cos(np.pi / (2 * rolloff * wc) * (w - lo)))))
    h_inf = np.fft.ifft(np.sqrt(P)).real
    return h_inf[(np.arange(L) - center) % NF]


def design_analysis_prototype(
    M: int, m: int, r: int, rolloff: float = 1.0, win_beta: float = 6.0
) -> np.ndarray:
    """Windowed sqrt-raised-cosine analysis prototype, length L = m*M.

    Normalised so sum(hf) = 1 (unit DC gain in bin 0).
    """
    L = m * M
    h = _sqrt_raised_cosine(L, M, rolloff, L // 2) * np.kaiser(L, win_beta)
    return h / h.sum()


def _pr_system(hf: np.ndarray, M: int, m: int, r: int, delay: int):
    """Linear PR system R @ gf = target for overall (padded-coords) delay.

    Rows are (residue τ in [0,D), lag d ∈ {-(m-1)M .. (m-1)M} step M):
        sum_{j ≡ τ (mod D)} hf[j - d] * gf[j]  =  δ[d - delay]
    """
    L = m * M
    D = M // r
    lags = np.arange(-(m - 1), m) * M
    rows = []
    tgt = []
    for tau in range(D):
        js = np.arange(tau, L, D)
        for d in lags:
            row = np.zeros(L)
            jd = js - d
            ok = (jd >= 0) & (jd < L)
            row[js[ok]] = hf[jd[ok]]
            rows.append(row)
            tgt.append(1.0 if d == delay else 0.0)
    return np.asarray(rows), np.asarray(tgt)


def _stopband_gram(L: int, omega_s: float) -> np.ndarray:
    """Gram matrix Q with g^T Q g = (1/pi) ∫_{ωs}^{π} |G(e^{jω})|² dω."""
    k = np.arange(L)
    diff = k[:, None] - k[None, :]
    Q = np.where(diff == 0, (np.pi - omega_s), -np.sin(omega_s * diff) / np.where(diff == 0, 1, diff))
    return Q / np.pi


def _reg_solve(R, t, Q, lam):
    RtR, Rtt = R.T @ R, R.T @ t
    scale = np.trace(RtR) / max(np.trace(Q), 1e-30)
    return np.linalg.solve(RtR + lam * scale * Q, Rtt)


def design_synthesis_prototype(
    hf: np.ndarray,
    M: int,
    m: int,
    r: int,
    lam: float = 1e-3,
    rolloff: float = 1.0,
) -> tuple[np.ndarray, int]:
    """Synthesis prototype gf for a given hf, and the design delay (= 0).

    Minimises ||R gf - t||² + λ·(stopband energy of gf beyond (1+β)π/M·1.1),
    i.e. total response error vs. leakage — the de Haan tradeoff [K].
    λ = 1e-3 lands at ≈ -80 dB PR with ≈ -45 dB synthesis stopband for the
    standard r=2 configurations.
    """
    L = m * M
    Q = _stopband_gram(L, np.pi / M * (1 + rolloff) * 1.1)
    R, t = _pr_system(hf, M, m, r, 0)
    return _reg_solve(R, t, Q, lam), 0


def design_prototypes(
    M: int,
    m: int,
    r: int,
    joint_iters: int = 2,
    lam: float = 1e-3,
    rolloff: float = 1.0,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Full (hf, gf, delay) design with optional alternating refinement.

    The PR system is bilinear and role-symmetric in (hf, gf) at delay 0, so
    alternating the regularised LS between the two prototypes balances their
    stopbands (≈ -41 dB each at PR ≈ -83 dB for M=256, m=4, r=2).  With
    joint_iters=0 this is the plain hf-then-gf design.  For r = 1 use more
    iterations (≥ 6); PR saturates near -35 dB (fundamental for critically
    sampled DFT banks).
    """
    L = m * M
    Q = _stopband_gram(L, np.pi / M * (1 + rolloff) * 1.1)
    hf = design_analysis_prototype(M, m, r, rolloff)
    gf, _ = design_synthesis_prototype(hf, M, m, r, lam, rolloff)
    for _ in range(joint_iters):
        # Fix gf, solve hf: the role swap with delay 0 is the same system.
        R, t = _pr_system(gf, M, m, r, 0)
        hf = _reg_solve(R, t, Q, lam)
        R, t = _pr_system(hf, M, m, r, 0)
        gf = _reg_solve(R, t, Q, lam)
    return hf, gf, 0


def pr_error_db(hf, gf, M: int, m: int, r: int, delay: int = 0) -> float:
    """Relative PR residual in dB: 20·log10(||R gf - t|| / ||t||)."""
    R, t = _pr_system(hf, M, m, r, delay)
    return 20.0 * np.log10(np.linalg.norm(R @ gf - t) / np.linalg.norm(t) + 1e-300)


def num_frames(S: int, M: int, m: int, r: int) -> int:
    """Frame count covering S samples incl. pad and synthesis tail."""
    L, D = m * M, M // r
    return -(-(S + (L - D) + L) // D)


def analysis(x: np.ndarray, hf: np.ndarray, M: int, r: int) -> np.ndarray:
    """Subband analysis.  x: (S,) float → (T, M//2+1) complex128."""
    L = len(hf)
    D = M // r
    P = L - D
    S = len(x)
    T = -(-(S + P + L) // D)  # ceil; extra tail frames for synthesis
    xp = np.concatenate([np.zeros(P), x, np.zeros((T - 1) * D + L - P - S)])
    out = np.empty((T, M // 2 + 1), dtype=np.complex128)
    for t in range(T):
        w = hf * xp[t * D : t * D + L]
        u = w.reshape(-1, M).sum(axis=0)  # polyphase fold
        out[t] = np.fft.rfft(u)
    return out


def synthesis(A: np.ndarray, gf: np.ndarray, M: int, r: int, delay: int, out_len: int) -> np.ndarray:
    """Subband synthesis (overlap-add).  A: (T, M//2+1) → (out_len,) float."""
    L = len(gf)
    D = M // r
    P = L - D
    T = A.shape[0]
    y = np.zeros((T - 1) * D + L)
    tile = np.arange(L) % M
    for t in range(T):
        v = np.fft.irfft(A[t], M)
        y[t * D : t * D + L] += gf * v[tile]
    start = P + delay
    return y[start : start + out_len]
