"""Pallas GSC-NLMS kernel — the adaptive-weight-update hot loop (HOT LOOP 1,
SURVEY.md §3.1; north_star "adaptive-weight-update ... as Pallas kernels").

One kernel call runs the WHOLE frame recurrence: the grid dimension is the
frame index, the active weights live in VMEM scratch and persist across
grid steps (TPU grids execute sequentially on the core), and each step is a
handful of (N, K) VPU ops.  Complex arithmetic is explicit re/im pairs
(Mosaic has no complex dtype).  Numerics match `beamforming.gsc_nlms`
(tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dsr_tpu.ops.pallas import use_interpret

LANES = 128


def _gsc_kernel(xr_ref, xi_ref, wqr_ref, wqi_ref, br_ref, bi_ref, w0r_ref, w0i_ref,
                yr_ref, yi_ref, wfr_ref, wfi_ref, war, wai, *, N, mu, eps, cap):
    t = pl.program_id(0)
    T = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        war[...] = w0r_ref[...]
        wai[...] = w0i_ref[...]

    xr = xr_ref[0]  # (N, Kp)
    xi = xi_ref[0]
    wqr = wqr_ref[...]
    wqi = wqi_ref[...]
    # yc = wq^H x = Σ_n conj(wq)·x
    ycr = jnp.sum(wqr * xr + wqi * xi, axis=0, keepdims=True)   # (1, Kp)
    yci = jnp.sum(wqr * xi - wqi * xr, axis=0, keepdims=True)
    # z = B^H x  (B stored as (N, N-1, Kp))
    zr = jnp.zeros((N - 1, xr.shape[-1]), jnp.float32)
    zi = jnp.zeros((N - 1, xr.shape[-1]), jnp.float32)
    for n in range(N):
        brn = br_ref[n]  # (N-1, Kp)
        bin_ = bi_ref[n]
        zr = zr + brn * xr[n][None, :] + bin_ * xi[n][None, :]
        zi = zi + brn * xi[n][None, :] - bin_ * xr[n][None, :]
    # y = yc - wa^H z
    wr = war[...]
    wi = wai[...]
    yr = ycr - jnp.sum(wr * zr + wi * zi, axis=0, keepdims=True)
    yi = yci - jnp.sum(wr * zi - wi * zr, axis=0, keepdims=True)
    yr_ref[0, 0] = yr[0]
    yi_ref[0, 0] = yi[0]
    # NLMS update: wa += mu z conj(y) / (||z||² + eps), then norm cap
    znorm = jnp.sum(zr * zr + zi * zi, axis=0, keepdims=True)
    g = mu / (znorm + eps)
    upr = (zr * yr + zi * yi) * g
    upi = (zi * yr - zr * yi) * g
    wr = wr + upr
    wi = wi + upi
    nrm = jnp.sqrt(jnp.sum(wr * wr + wi * wi, axis=0, keepdims=True))
    scale = jnp.minimum(1.0, cap / jnp.maximum(nrm, 1e-30))
    war[...] = wr * scale
    wai[...] = wi * scale

    @pl.when(t == T - 1)
    def _emit_wa():
        wfr_ref[...] = war[...]
        wfi_ref[...] = wai[...]


@functools.partial(jax.jit, static_argnames=("mu", "eps", "cap"))
def _gsc_impl(Xr, Xi, wqr, wqi, Br, Bi, w0r, w0i, mu: float, eps: float, cap: float):
    T, N, Kp = Xr.shape
    yr, yi, wfr, wfi = pl.pallas_call(
        functools.partial(_gsc_kernel, N=N, mu=mu, eps=eps, cap=cap),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, N, Kp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, Kp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, Kp), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, Kp), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N - 1, Kp), lambda t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N - 1, Kp), lambda t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N - 1, Kp), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N - 1, Kp), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, Kp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Kp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N - 1, Kp), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N - 1, Kp), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, 1, Kp), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, Kp), jnp.float32),
            jax.ShapeDtypeStruct((N - 1, Kp), jnp.float32),
            jax.ShapeDtypeStruct((N - 1, Kp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((N - 1, Kp), jnp.float32),
            pltpu.VMEM((N - 1, Kp), jnp.float32),
        ],
        interpret=use_interpret(),
    )(Xr, Xi, wqr, wqi, Br, Bi, w0r, w0i)
    return yr[:, 0], yi[:, 0], wfr, wfi


def gsc_nlms(X: jnp.ndarray, wq: jnp.ndarray, B: jnp.ndarray,
             mu: float = 0.1, eps: float = 1e-6, wa_norm_cap: float = 10.0,
             wa0: jnp.ndarray | None = None):
    """Pallas GSC: X (N, T, K) or batched (Bb, N, T, K), wq (..., K, N),
    B (..., K, N, N-1), wa0 (..., K, N-1) or None
    → (Y (..., T, K), wa (..., K, N-1)).

    Same semantics as `dsr_tpu.ops.beamforming.gsc_nlms`, including wa0
    threading for streaming chunks.

    Batching folds the utterance axis into the LANE dimension (Kp → Bb·Kp):
    every kernel op is lane-wise or a sublane reduction, so a batch of
    independently adapting utterances (each with its own steering/blocking
    matrix) IS the single-utterance kernel with wider rows — one kernel
    call, per-step overhead amortised across the batch.
    """
    batched = X.ndim == 4
    if not batched:
        X, wq, B = X[None], wq[None], B[None]
        if wa0 is not None:
            wa0 = wa0[None]
    Bb, N, T, K = X.shape
    Kp = ((K + LANES - 1) // LANES) * LANES
    pad = Kp - K

    def prep(a):
        """(Bb, ..., K) → (..., Bb·Kp) f32: pad K, move batch beside it."""
        a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)]).astype(jnp.float32)
        a = jnp.moveaxis(a, 0, -2)                       # (..., Bb, Kp)
        return a.reshape(*a.shape[:-2], Bb * Kp)

    Xtkn = jnp.transpose(X, (0, 2, 1, 3))                # (Bb, T, N, K)
    Xr = prep(jnp.real(Xtkn))                            # (T, N, Bb·Kp)
    Xi = prep(jnp.imag(Xtkn))
    wqT = jnp.transpose(wq, (0, 2, 1))                   # (Bb, N, K)
    wqr = prep(jnp.real(wqT))                            # (N, Bb·Kp)
    wqi = prep(jnp.imag(wqT))
    Bt = jnp.transpose(B, (0, 2, 3, 1))                  # (Bb, N, N-1, K)
    # the kernel's z-accumulation computes conj(B)·x itself
    Br = prep(jnp.real(Bt))                              # (N, N-1, Bb·Kp)
    Bi = prep(jnp.imag(Bt))
    if wa0 is None:
        # eager complex allocation hits UNIMPLEMENTED on axon — build the
        # zero state as float parts directly
        w0r = jnp.zeros((N - 1, Bb * Kp), jnp.float32)
        w0i = jnp.zeros((N - 1, Bb * Kp), jnp.float32)
    else:
        w0t = jnp.transpose(wa0, (0, 2, 1))              # (Bb, N-1, K)
        w0r = prep(jnp.real(w0t))
        w0i = prep(jnp.imag(w0t))
    # guard padded lanes: znorm of zero-padded lanes is 0 → g = mu/eps large,
    # but z and y there are 0 so updates stay 0.  Safe.
    yr, yi, wfr, wfi = _gsc_impl(Xr, Xi, wqr, wqi, Br, Bi, w0r, w0i,
                                 float(mu), float(eps), float(wa_norm_cap))
    Y = jax.lax.complex(yr, yi).reshape(T, Bb, Kp)[..., :K]  # (T, Bb, K)
    Y = jnp.moveaxis(Y, 1, 0)
    wa = jax.lax.complex(wfr, wfi).reshape(N - 1, Bb, Kp)[..., :K]
    wa = jnp.transpose(wa, (1, 2, 0))                    # (Bb, K, N-1)
    return (Y, wa) if batched else (Y[0], wa[0])
