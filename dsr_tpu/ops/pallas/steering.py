"""Pallas fractional-delay steering + delay-and-sum kernel (north_star
"fractional-delay steering ... as Pallas kernels").

Fuses manifold computation and beamforming: per frame tile the kernel
evaluates the steering phases e^{-2πi f_k τ_n} with VPU transcendentals and
applies the distortionless DS weights in one pass — the (K, N) manifold is
never materialised in HBM.  Supports a per-frame delay trajectory (the
tracking front end updates τ over time, SURVEY.md §3.5): taus (T, N) or
static (N,).  Numerics match steering_vectors + ds_weights + apply_weights.

MEASURED: XLA WINS this loop (68 µs vs 172 µs Pallas for 16ch×1000fr
on-chip, tiles 8 and 64 tried — tools/bench_kernels.py).  The op is
transcendental-bound and XLA's fused sin/cos lowering already avoids the
HBM manifold; the kernel buys nothing and pays per-grid-step overhead.
`ops/beamforming.ds_beamform` therefore ships the XLA path; this kernel is
kept as the recorded counter-example (same policy as the dense decoder).
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


def _ds_kernel(xr_ref, xi_ref, tau_ref, f_ref, yr_ref, yi_ref, *, N, TT):
    # taus for this tile: (TT, N); freqs: (1, Kp)
    f = f_ref[...]                                       # (1, Kp)
    acc_r = jnp.zeros((TT, f.shape[-1]), jnp.float32)
    acc_i = jnp.zeros((TT, f.shape[-1]), jnp.float32)
    for n in range(N):
        tau_n = tau_ref[0, :, n][:, None]                # (TT, 1)
        ph = -2.0 * np.pi * f * tau_n                    # (TT, Kp)
        c = jnp.cos(ph)
        s = jnp.sin(ph)
        xr = xr_ref[0, :, n, :]                          # (TT, Kp)
        xi = xi_ref[0, :, n, :]
        # y += conj(v)·x = (c - j s)(xr + j xi)
        acc_r = acc_r + c * xr + s * xi
        acc_i = acc_i + c * xi - s * xr
    yr_ref[0] = acc_r / N
    yi_ref[0] = acc_i / N


@functools.partial(jax.jit, static_argnames=("TT",))
def _ds_impl(Xr, Xi, taus, freqs, TT: int):
    T, N, Kp = Xr.shape
    Tpad = ((T + TT - 1) // TT) * TT
    Xr = jnp.pad(Xr, ((0, Tpad - T), (0, 0), (0, 0)))
    Xi = jnp.pad(Xi, ((0, Tpad - T), (0, 0), (0, 0)))
    taus = jnp.pad(taus, ((0, Tpad - T), (0, 0)))
    yr, yi = pl.pallas_call(
        functools.partial(_ds_kernel, N=N, TT=TT),
        grid=(Tpad // TT,),
        in_specs=[
            pl.BlockSpec((1, TT, N, Kp), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TT, N, Kp), lambda t: (t, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TT, N), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Kp), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TT, Kp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TT, Kp), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Tpad // TT, TT, Kp), jnp.float32),
            jax.ShapeDtypeStruct((Tpad // TT, TT, Kp), jnp.float32),
        ],
        interpret=use_interpret(),
    )(
        Xr.reshape(Tpad // TT, TT, N, Kp),
        Xi.reshape(Tpad // TT, TT, N, Kp),
        taus.reshape(Tpad // TT, TT, N),
        freqs,
    )
    return yr.reshape(Tpad, Kp)[:T], yi.reshape(Tpad, Kp)[:T]


def ds_beamform(X: jnp.ndarray, taus_sec: jnp.ndarray, M: int, sample_rate: float,
                tile: int = 8) -> jnp.ndarray:
    """Fused steering+DS: X (N, T, K) complex, taus (N,) or (T, N) → (T, K)."""
    N, T, K = X.shape
    Kp = ((K + LANES - 1) // LANES) * LANES
    pad = Kp - K
    Xt = jnp.transpose(X, (1, 0, 2))
    Xr = jnp.pad(jnp.real(Xt), ((0, 0), (0, 0), (0, pad))).astype(jnp.float32)
    Xi = jnp.pad(jnp.imag(Xt), ((0, 0), (0, 0), (0, pad))).astype(jnp.float32)
    taus = jnp.asarray(taus_sec, jnp.float32)
    if taus.ndim == 1:
        taus = jnp.broadcast_to(taus[None, :], (T, N))
    freqs = jnp.pad(jnp.arange(K) * (sample_rate / M), (0, pad)).astype(jnp.float32)[None, :]
    yr, yi = _ds_impl(Xr, Xi, taus, freqs, tile)
    return jax.lax.complex(yr[:, :K], yi[:, :K])
