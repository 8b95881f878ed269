"""MLLR mean-transform adaptation (reference `asr/adapt/` MLLR [K]).

Per regression class, the mean transform W (D × D+1) maximising the EM
auxiliary for diagonal-covariance GMMs has the classic row-wise closed
form:  for each dim d,   w_d = G_d⁻¹ k_d   with
    G_d = Σ_g occ_g / σ²_{g,d} · ξ_g ξ_gᵀ          (ξ_g = [1, μ_g])
    k_d = Σ_g sx_{g,d} / σ²_{g,d} · ξ_g
computed straight from the standard ML accumulators (occ, Σγx) — the same
statistics `train.ml.accumulate` already produces.  Adapted means:
μ' = W ξ.  TPU-first: all sums are einsums over (S·C) Gaussians; the D
row-solves are one batched `jnp.linalg.solve`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dsr_tpu.asr.am.gmm import GmmParams
from dsr_tpu.asr.train.ml import GmmAccum


@jax.jit
def estimate_mllr(params: GmmParams, acc: GmmAccum, reg: float = 1e-4) -> jnp.ndarray:
    """→ W (D, D+1) global-class MLLR mean transform."""
    S, C, D = params.means.shape
    mu = params.means.reshape(S * C, D)
    inv_v = (1.0 / params.variances).reshape(S * C, D)
    occ = acc.occ.reshape(S * C)
    sx = acc.sx.reshape(S * C, D)
    xi = jnp.concatenate([jnp.ones((S * C, 1)), mu], axis=1)          # (G, D+1)
    # G_d = Σ_g occ_g invv_{g,d} ξ_g ξ_gᵀ   → (D, D+1, D+1)
    Gd = jnp.einsum("g,gd,gi,gj->dij", occ, inv_v, xi, xi)
    kd = jnp.einsum("gd,gd,gi->di", sx, inv_v, xi)
    Gd = Gd + reg * jnp.eye(D + 1)[None]
    W = jnp.linalg.solve(Gd, kd[..., None])[..., 0]                   # (D, D+1)
    return W


@jax.jit
def apply_mllr(params: GmmParams, W: jnp.ndarray) -> GmmParams:
    """Transform all means: μ' = W [1, μ]."""
    S, C, D = params.means.shape
    mu = params.means.reshape(S * C, D)
    xi = jnp.concatenate([jnp.ones((S * C, 1)), mu], axis=1)
    mu2 = xi @ W.T
    return GmmParams(mu2.reshape(S, C, D), params.variances, params.logweights)
