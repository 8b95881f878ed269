"""Pallas oversampled-DFT filterbank kernels (HOT LOOP 2, SURVEY.md §3.1).

Why a kernel: the XLA path materialises the (T, L) frame matrix in HBM —
an m·r× read/write amplification of the signal (8× for m=4, r=2).  These
kernels stream the raw signal HBM→VMEM once per tile, do the polyphase
window+fold on the VPU, and evaluate the DFT as MXU matmuls, writing only
the (T, K) subband output back.

STATUS: the v3 analysis kernel (rD == 1 path: one aligned (TT, 128) DMA
per window row-offset, fold = full-block FMAs) runs 64ch×8s in ~1 ms vs
XLA's 31 ms at err ~2e-7.  It IS the production path for standalone
analysis (`ops.filterbank.analysis` dispatches to it on TPU for supported
configs); the SERVING path for fixed-weight beamforming is the fused
`analysis_beamform` kernel below (0.64 ms for the same workload — the
per-channel (C, T, K) subband tensor never touches HBM).  The v2 kernel
(general D) survives for rD > 1 but loses to XLA there — its fold slices
land at non-8-aligned sublane offsets, which Mosaic lowers as per-slice
relayouts.

Measured design walls on this toolchain (axon + Mosaic, 2026-08), so the
next session doesn't re-try them:
  - Non-8-aligned sublane slices of VMEM refs (win_ref[j:j+TT] for j not a
    multiple of 8) fail to lower at ALL (UNIMPLEMENTED at run time), both
    as vector loads and as VMEM→VMEM async copies.  The only unaligned
    row shift on this hardware is an HBM→VMEM DMA — hence the
    one-DMA-per-window-offset design and its inherent Lrows× HBM read
    amplification.
  - That amplification saturates the DMA path at ~400 GB/s effective for
    the fused kernel (8 overlapping 256 KB reads per step); deeper
    prefetch (nslots 3/4) does not change throughput, so 2-slot
    double-buffering is kept as the default.
  - jax.lax.Precision.HIGH has no Mosaic lowering; f32-accurate matmuls
    cheaper than HIGHEST use the manual bf16x3 decomposition (_dot3).

Tile-native layout (Mosaic requires (8, 128)-aligned slices):
  - the signal is viewed as rows of 128 samples; sample s = (row, lane)
  - hop rows rD = D/128 (the kernels require D % 128 == 0 — true for the
    production configs M=256/512; other configs use the XLA path)
  - prototype/window live as (Lrows, 128); the polyphase fold
    u[p = (row mod mrows)·128 + lane] is a strided row-sum (VPU)
  - the DFT  A[k] = Σ_p u[p]·e^{-2πipk/M}  splits into mrows (TT, 128) @
    (128, K) MXU matmuls, one per row-residue — no cross-lane reshapes.

Numerics match `dsr_tpu/ops/filterbank.py` (tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dsr_tpu.config import FilterbankConfig
from dsr_tpu.ops.filterbank import get_prototypes, num_frames
from dsr_tpu.ops.pallas import use_interpret

HI = jax.lax.Precision.HIGHEST
LANES = 128


def supported(cfg: FilterbankConfig) -> bool:
    return cfg.D % LANES == 0


def _dft_mats(M: int) -> tuple[np.ndarray, np.ndarray]:
    K = M // 2 + 1
    p = np.arange(M)[:, None]
    k = np.arange(K)[None, :]
    ang = -2.0 * np.pi * p * k / M
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _analysis_kernel(x_ref, hf_ref, cos_ref, sin_ref, re_ref, im_ref, win_ref, sem,
                     *, TT, rD, Lrows, mrows, WR, totalrows, K):
    c = pl.program_id(0)
    i = pl.program_id(1)
    row0 = c * totalrows + i * TT * rD
    cp = pltpu.make_async_copy(x_ref.at[pl.ds(row0, WR), :], win_ref, sem)
    cp.start()
    cp.wait()
    acc_re = jnp.zeros((TT, K), jnp.float32)
    acc_im = jnp.zeros((TT, K), jnp.float32)
    # Vectorised fold: U_pr[f] = Σ_q win[f·rD + q·mrows + pr]·hf[...] — with
    # the window viewed as (rows/rD, rD, 128), frame-major slices of TT rows
    # replace per-frame row loops (the m accumulations are (TT,128) blocks).
    win3 = win_ref[...].reshape(WR // rD, rD, LANES)
    for pr in range(mrows):
        U = jnp.zeros((TT, LANES), jnp.float32)
        for q in range(Lrows // mrows):
            j = q * mrows + pr
            seg = win3[j // rD : j // rD + TT, j % rD, :]    # (TT, 128), static
            U = U + seg * hf_ref[j][None, :]
        acc_re = acc_re + jnp.dot(
            U, cos_ref[pl.ds(pr * LANES, LANES), :],
            preferred_element_type=jnp.float32, precision=HI,
        )
        acc_im = acc_im + jnp.dot(
            U, sin_ref[pl.ds(pr * LANES, LANES), :],
            preferred_element_type=jnp.float32, precision=HI,
        )
    re_ref[0] = acc_re
    im_ref[0] = acc_im


def _analysis_kernel_v3(x_ref, hf_ref, cos_ref, sin_ref, re_ref, im_ref, wins_ref, sems,
                        *, TT, Lrows, mrows, totalrows, K):
    """rD == 1 fast path: one aligned (TT, 128) DMA per window row-offset j,
    so the fold is Lrows full-block fused multiply-adds — no sublane
    relayouts (the v2 kernel's bottleneck)."""
    c = pl.program_id(0)
    i = pl.program_id(1)
    row0 = c * totalrows + i * TT
    cps = []
    for j in range(Lrows):
        cp = pltpu.make_async_copy(
            x_ref.at[pl.ds(row0 + j, TT), :], wins_ref.at[j], sems.at[j]
        )
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()
    acc_re = jnp.zeros((TT, K), jnp.float32)
    acc_im = jnp.zeros((TT, K), jnp.float32)
    for pr in range(mrows):
        U = jnp.zeros((TT, LANES), jnp.float32)
        for q in range(Lrows // mrows):
            j = q * mrows + pr
            U = U + wins_ref[j] * hf_ref[j][None, :]
        acc_re = acc_re + jnp.dot(
            U, cos_ref[pl.ds(pr * LANES, LANES), :],
            preferred_element_type=jnp.float32, precision=HI,
        )
        acc_im = acc_im + jnp.dot(
            U, sin_ref[pl.ds(pr * LANES, LANES), :],
            preferred_element_type=jnp.float32, precision=HI,
        )
    re_ref[0] = acc_re
    im_ref[0] = acc_im


@functools.partial(jax.jit, static_argnames=("cfg", "T", "TT"))
def _analysis_impl_v3(x, hf, cfg: FilterbankConfig, T: int, TT: int):
    """x: (C, S) → (C, T, K); requires D == 128 (rD == 1)."""
    M, D, L = cfg.M, cfg.D, cfg.L
    K = cfg.num_bins
    P = L - D
    C, S = x.shape
    Lrows = L // LANES
    mrows = M // LANES
    Tpad = ((T + TT - 1) // TT) * TT
    totalrows = ((Tpad + Lrows + 8 + 7) // 8) * 8
    total = totalrows * LANES
    xp = jnp.pad(x, ((0, 0), (P, total - P - S))).reshape(C * totalrows, LANES)
    cos, sin = _dft_mats(M)
    grid = (C, Tpad // TT)
    re, im = pl.pallas_call(
        functools.partial(
            _analysis_kernel_v3, TT=TT, Lrows=Lrows, mrows=mrows,
            totalrows=totalrows, K=K,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((Lrows, LANES), lambda c, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, K), lambda c, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, K), lambda c, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TT, K), lambda c, i: (c, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TT, K), lambda c, i: (c, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, Tpad, K), jnp.float32),
            jax.ShapeDtypeStruct((C, Tpad, K), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((L // LANES, TT, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((L // LANES,)),
        ],
        interpret=use_interpret(),
    )(xp, hf.reshape(Lrows, LANES).astype(jnp.float32), jnp.asarray(cos), jnp.asarray(sin))
    return jax.lax.complex(re[:, :T], im[:, :T])


@functools.partial(jax.jit, static_argnames=("cfg", "T", "TT"))
def _analysis_impl(x, hf, cfg: FilterbankConfig, T: int, TT: int):
    """x: (C, S) → (C, T, K) complex64."""
    M, D, L = cfg.M, cfg.D, cfg.L
    K = cfg.num_bins
    P = L - D
    C, S = x.shape
    rD = D // LANES
    Lrows = L // LANES
    mrows = M // LANES
    Tpad = ((T + TT - 1) // TT) * TT
    WR = (TT - 1) * rD + Lrows
    WR8 = ((WR + 7) // 8) * 8                      # DMA row count, 8-aligned
    totalrows = ((Tpad * rD + Lrows + (WR8 - WR) + 8 + 7) // 8) * 8
    total = totalrows * LANES
    xp = jnp.pad(x, ((0, 0), (P, total - P - S))).reshape(C * totalrows, LANES)
    cos, sin = _dft_mats(M)
    grid = (C, Tpad // TT)
    re, im = pl.pallas_call(
        functools.partial(
            _analysis_kernel, TT=TT, rD=rD, Lrows=Lrows, mrows=mrows,
            WR=WR8, totalrows=totalrows, K=K,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((Lrows, LANES), lambda c, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, K), lambda c, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, K), lambda c, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TT, K), lambda c, i: (c, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TT, K), lambda c, i: (c, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C, Tpad, K), jnp.float32),
            jax.ShapeDtypeStruct((C, Tpad, K), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((WR8, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=use_interpret(),
    )(xp, hf.reshape(Lrows, LANES).astype(jnp.float32), jnp.asarray(cos), jnp.asarray(sin))
    return jax.lax.complex(re[:, :T], im[:, :T])


def analysis(x: jnp.ndarray, cfg: FilterbankConfig, hf: np.ndarray | None = None,
             tile: int = 256) -> jnp.ndarray:
    """Pallas subband analysis: (..., S) → (..., T, M//2+1) complex64."""
    assert supported(cfg), f"Pallas filterbank needs D%{LANES}==0; got D={cfg.D}"
    if hf is None:
        hf = get_prototypes(cfg)[0]
    hf = jnp.asarray(hf, jnp.float32)
    T = num_frames(x.shape[-1], cfg)
    squeeze = x.ndim == 1
    flat = x.reshape(-1, x.shape[-1])
    impl = _analysis_impl_v3 if cfg.D == LANES else _analysis_impl
    out = impl(flat, hf, cfg, T, tile)
    return out[0] if squeeze else out.reshape(*x.shape[:-1], T, cfg.num_bins)


def _dot3(U, Fc, Fs, acc_re, acc_im):
    """bf16x3 matmul pair with f32 accumulation (see _analysis_bf_kernel)."""
    f32, bf16 = jnp.float32, jnp.bfloat16
    Uh = U.astype(bf16)
    Ul = (U - Uh.astype(f32)).astype(bf16)
    for F, acc_is_re in ((Fc, True), (Fs, False)):
        Fh = F.astype(bf16)
        Fl = (F - Fh.astype(f32)).astype(bf16)
        d = (
            jnp.dot(Uh, Fh, preferred_element_type=f32)
            + jnp.dot(Ul, Fh, preferred_element_type=f32)
            + jnp.dot(Uh, Fl, preferred_element_type=f32)
        )
        if acc_is_re:
            acc_re = acc_re + d
        else:
            acc_im = acc_im + d
    return acc_re, acc_im


def _analysis_bf_kernel(idx_ref, x_ref, hf_ref, cos_ref, sin_ref, wre_ref, wim_ref,
                        yre_ref, yim_ref, wins_ref, sems,
                        *, TT, Lrows, mrows, totalrows, K, C, prec, nslots=2):
    """Fused analysis + fixed-weight beamform, rD == 1 path.

    Grid is (Ttiles, C) with the channel axis INNERMOST: the (TT, K)
    output block for tile i stays resident in VMEM while every channel's
    conj(w_c)·A_c contribution accumulates into it — the per-channel
    subband tensor (C, T, K) complex64 (132 MB of HBM round trip at 64
    ch × 8 s) is never materialised.  Window DMAs are double-buffered
    across channel steps (issue c+1 before computing c).  `idx_ref` is a
    scalar-prefetched buffer index: x_ref may hold several pre-staged
    utterances (serving batches pad/stage once at ingest) and the kernel
    addresses the selected one — no XLA-side gather/pad per call."""
    i = pl.program_id(0)
    c = pl.program_id(1)
    base = idx_ref[0] * (C * totalrows)

    def copies(ch, slot):
        row0 = base + ch * totalrows + i * TT
        return [
            pltpu.make_async_copy(
                x_ref.at[pl.ds(row0 + j, TT), :], wins_ref.at[slot, j],
                sems.at[slot, j],
            )
            for j in range(Lrows)
        ]

    @pl.when(c == 0)
    def _prologue():
        for ahead in range(min(nslots - 1, C)):
            for cp in copies(ahead, ahead % nslots):
                cp.start()

    @pl.when(c + nslots - 1 < C)
    def _prefetch():
        for cp in copies(c + nslots - 1, (c + nslots - 1) % nslots):
            cp.start()

    slot = c % nslots
    for cp in copies(c, slot):
        cp.wait()

    acc_re = jnp.zeros((TT, K), jnp.float32)
    acc_im = jnp.zeros((TT, K), jnp.float32)
    for pr in range(mrows):
        U = jnp.zeros((TT, LANES), jnp.float32)
        for q in range(Lrows // mrows):
            j = q * mrows + pr
            U = U + wins_ref[slot, j] * hf_ref[j][None, :]
        Fc = cos_ref[pl.ds(pr * LANES, LANES), :]
        Fs = sin_ref[pl.ds(pr * LANES, LANES), :]
        if prec == "bf16x3":
            # 3-pass bf16 decomposition: ~f32 accuracy at half HIGHEST's
            # MXU passes (Mosaic has no HIGH lowering).  U = Uh + Ul,
            # F = Fh + Fl; drop the Ul·Fl term (O(2^-16) relative).
            acc_re, acc_im = _dot3(U, Fc, Fs, acc_re, acc_im)
        else:
            acc_re = acc_re + jnp.dot(
                U, Fc, preferred_element_type=jnp.float32, precision=prec,
            )
            acc_im = acc_im + jnp.dot(
                U, Fs, preferred_element_type=jnp.float32, precision=prec,
            )
    wr = wre_ref[pl.ds(c, 1), :]                       # (1, K)
    wi = wim_ref[pl.ds(c, 1), :]
    # y += conj(w_c) · A_c
    yre_c = acc_re * wr + acc_im * wi
    yim_c = acc_im * wr - acc_re * wi

    @pl.when(c == 0)
    def _init():
        yre_ref[...] = yre_c
        yim_ref[...] = yim_c

    @pl.when(c != 0)
    def _accum():
        yre_ref[...] = yre_ref[...] + yre_c
        yim_ref[...] = yim_ref[...] + yim_c


def _stage_geom(cfg: FilterbankConfig, T: int, TT: int) -> tuple[int, int]:
    Lrows = cfg.L // LANES
    Tpad = ((T + TT - 1) // TT) * TT
    totalrows = ((Tpad + Lrows + 8 + 7) // 8) * 8
    return Tpad, totalrows


@functools.partial(jax.jit, static_argnames=("cfg", "tile"))
def stage_for_beamform(x: jnp.ndarray, cfg: FilterbankConfig, tile: int = 256):
    """Pre-pad (..., C, S) signals into the fused kernel's frame layout:
    (B, C·totalrows, 128).  Serving batches stage once at ingest; the
    kernel then addresses buffers by scalar index with zero per-call
    XLA-side pad/gather work."""
    P = cfg.L - cfg.D
    S = x.shape[-1]
    T = num_frames(S, cfg)
    _, totalrows = _stage_geom(cfg, T, tile)
    total = totalrows * LANES
    flat = x.reshape(-1, x.shape[-2], S)
    xp = jnp.pad(flat, ((0, 0), (0, 0), (P, total - P - S)))
    return xp.reshape(flat.shape[0], flat.shape[1] * totalrows, LANES)


@functools.partial(jax.jit, static_argnames=("cfg", "T", "TT", "prec", "nslots"))
def _analysis_bf_staged(xp, idx, hf, wre, wim, cfg: FilterbankConfig, T: int,
                        TT: int, prec, nslots: int = 2):
    """xp: (B, C·totalrows, 128) staged, idx: scalar int32, w parts: (C, K)
    → y: (T, K) complex64; requires D == 128."""
    M, L = cfg.M, cfg.L
    K = cfg.num_bins
    C = wre.shape[0]
    Lrows = L // LANES
    mrows = M // LANES
    Tpad, totalrows = _stage_geom(cfg, T, TT)
    assert xp.shape[1] == C * totalrows and xp.shape[2] == LANES
    cos, sin = _dft_mats(M)
    grid = (Tpad // TT, C)                          # channel axis innermost
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((Lrows, LANES), lambda i, c, idx: (0, 0)),
            pl.BlockSpec((M, K), lambda i, c, idx: (0, 0)),
            pl.BlockSpec((M, K), lambda i, c, idx: (0, 0)),
            pl.BlockSpec((C, K), lambda i, c, idx: (0, 0)),
            pl.BlockSpec((C, K), lambda i, c, idx: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TT, K), lambda i, c, idx: (i, 0)),
            pl.BlockSpec((TT, K), lambda i, c, idx: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((nslots, Lrows, TT, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((nslots, Lrows)),
        ],
    )
    re, im = pl.pallas_call(
        functools.partial(
            _analysis_bf_kernel, TT=TT, Lrows=Lrows, mrows=mrows,
            totalrows=totalrows, K=K, C=C, prec=prec, nslots=nslots,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Tpad, K), jnp.float32),
            jax.ShapeDtypeStruct((Tpad, K), jnp.float32),
        ],
        interpret=use_interpret(),
    )(
        jnp.asarray(idx, jnp.int32).reshape(1),
        xp.reshape(-1, LANES),
        hf.reshape(Lrows, LANES).astype(jnp.float32),
        jnp.asarray(cos), jnp.asarray(sin), wre, wim,
    )
    return jax.lax.complex(re[:T], im[:T])


_PRECS = {"highest": jax.lax.Precision.HIGHEST, "bf16x3": "bf16x3",
          "default": jax.lax.Precision.DEFAULT}


def analysis_beamform_staged(xp: jnp.ndarray, idx, w: jnp.ndarray,
                             cfg: FilterbankConfig, num_samples: int,
                             hf: np.ndarray | None = None, tile: int = 256,
                             precision: str = "highest") -> jnp.ndarray:
    """Fused analysis+beamform over a pre-staged buffer bank.

    xp: output of `stage_for_beamform` (B, C·totalrows, 128); idx selects
    the utterance (traced scalar OK — it is scalar-prefetched, so one
    compilation serves the whole bank); w: (K, C) complex weights.
    Returns (T, K) complex64 beamformed subbands."""
    assert supported(cfg) and cfg.D == LANES, (
        f"fused analysis+beamform needs D == {LANES}; got D={cfg.D}"
    )
    if hf is None:
        hf = get_prototypes(cfg)[0]
    hf = jnp.asarray(hf, jnp.float32)
    T = num_frames(num_samples, cfg)
    wre = jnp.real(w).T.astype(jnp.float32)          # (C, K)
    wim = jnp.imag(w).T.astype(jnp.float32)
    return _analysis_bf_staged(xp, idx, hf, wre, wim, cfg, T, tile,
                               _PRECS[precision])


def analysis_beamform(x: jnp.ndarray, w: jnp.ndarray, cfg: FilterbankConfig,
                      hf: np.ndarray | None = None, tile: int = 256,
                      precision: str = "highest") -> jnp.ndarray:
    """Fused subband analysis + fixed-weight beamform.

    x: (C, S) float32 multi-channel signal; w: (K, C) complex weights
    (`apply_weights` convention) → (T, K) complex64 beamformed subbands,
    equal to `apply_weights(analysis(x), w)` without materialising the
    per-channel (C, T, K) subband tensor.  DS/MVDR serving path
    (time-invariant weights); adaptive beamformers use the unfused path.
    """
    xp = stage_for_beamform(x, cfg, tile)
    return analysis_beamform_staged(xp, 0, w, cfg, x.shape[-1], hf, tile,
                                    precision)


def _synthesis_kernel(re_ref, im_ref, gf_ref, cos_ref, sin_ref, y_ref, acc_ref, sem,
                      *, TT, rD, Lrows, mrows, mr, nbpad, Kp):
    c = pl.program_id(0)
    i = pl.program_id(1)
    F = TT + mr - 1
    F8 = ((F + 7) // 8) * 8
    cp_r = pltpu.make_async_copy(
        re_ref.at[pl.ds(c * nbpad + i * TT, F8), :], acc_ref.at[0], sem.at[0]
    )
    cp_i = pltpu.make_async_copy(
        im_ref.at[pl.ds(c * nbpad + i * TT, F8), :], acc_ref.at[1], sem.at[1]
    )
    cp_r.start()
    cp_i.start()
    cp_r.wait()
    cp_i.wait()
    vs = []
    for pr in range(mrows):
        v_pr = jnp.dot(
            acc_ref[0, :F], cos_ref[:, pl.ds(pr * LANES, LANES)],
            preferred_element_type=jnp.float32, precision=HI,
        ) + jnp.dot(
            acc_ref[1, :F], sin_ref[:, pl.ds(pr * LANES, LANES)],
            preferred_element_type=jnp.float32, precision=HI,
        )
        vs.append(v_pr)  # (F, 128) — row-residue pr of the IDFT frames
    out_rows = []
    for b in range(TT):
        for rr in range(rD):
            acc = jnp.zeros((1, LANES), jnp.float32)
            for j in range(mr):
                lrow = j * rD + rr                    # row within the frame
                f = b - j + mr - 1                    # padded frame index
                pr = lrow % mrows
                acc = acc + gf_ref[lrow][None, :] * vs[pr][f][None, :]
            out_rows.append(acc)
    y_ref[0] = jnp.concatenate(out_rows, axis=0)      # (TT*rD, 128)


@functools.partial(jax.jit, static_argnames=("cfg", "out_len", "TT"))
def _synthesis_impl(A, gf, cfg: FilterbankConfig, out_len: int, TT: int):
    """A: (C, T, K) complex → (C, out_len) float32."""
    M, D, L = cfg.M, cfg.D, cfg.L
    mr = L // D
    K = cfg.num_bins
    P = L - D
    C, T, _ = A.shape
    rD = D // LANES
    Lrows = L // LANES
    mrows = M // LANES
    nb = (T + mr - 1 + TT - 1) // TT * TT
    nbpad = ((nb + 8 + 7) // 8) * 8                  # channel stride with margin
    re = jnp.pad(jnp.real(A).astype(jnp.float32), ((0, 0), (mr - 1, nbpad - T - (mr - 1)), (0, 0)))
    im = jnp.pad(jnp.imag(A).astype(jnp.float32), ((0, 0), (mr - 1, nbpad - T - (mr - 1)), (0, 0)))
    Kp = ((K + LANES - 1) // LANES) * LANES       # lane-aligned DMA width
    re = jnp.pad(re, ((0, 0), (0, 0), (0, Kp - K))).reshape(C * nbpad, Kp)
    im = jnp.pad(im, ((0, 0), (0, 0), (0, Kp - K))).reshape(C * nbpad, Kp)
    p = np.arange(M)[None, :]
    k = np.arange(K)[:, None]
    ang = 2.0 * np.pi * p * k / M
    scale = np.full((K, 1), 2.0 / M, np.float32)
    scale[0] = 1.0 / M
    if M % 2 == 0:
        scale[-1] = 1.0 / M
    cosT = np.zeros((Kp, M), np.float32)              # zero rows: padded bins
    sinT = np.zeros((Kp, M), np.float32)
    cosT[:K] = np.cos(ang) * scale
    sinT[:K] = -np.sin(ang) * scale
    F8 = ((TT + mr - 1 + 7) // 8) * 8
    grid = (C, nb // TT)
    y = pl.pallas_call(
        functools.partial(
            _synthesis_kernel, TT=TT, rD=rD, Lrows=Lrows, mrows=mrows, mr=mr,
            nbpad=nbpad, Kp=Kp,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((Lrows, LANES), lambda c, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, M), lambda c, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, M), lambda c, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TT * rD, LANES), lambda c, i: (c, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((C, nb * rD, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, F8, Kp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=use_interpret(),
    )(re, im, gf.reshape(Lrows, LANES).astype(jnp.float32), jnp.asarray(cosT), jnp.asarray(sinT))
    yflat = y.reshape(C, -1)
    return jax.lax.dynamic_slice_in_dim(yflat, P, out_len, axis=1)


def synthesis(A: jnp.ndarray, cfg: FilterbankConfig, out_len: int,
              gf: np.ndarray | None = None, delay: int | None = None,
              tile: int = 16) -> jnp.ndarray:
    """Pallas subband synthesis: (..., T, K) → (..., out_len) float32."""
    assert supported(cfg), f"Pallas filterbank needs D%{LANES}==0; got D={cfg.D}"
    if gf is None or delay is None:
        _, gf_, delay_ = get_prototypes(cfg)
        gf = gf_ if gf is None else gf
        delay = delay_ if delay is None else delay
    assert delay == 0, "packed prototypes use delay 0"
    gf = jnp.asarray(gf, jnp.float32)
    squeeze = A.ndim == 2
    flat = A.reshape(-1, *A.shape[-2:])
    impl = _synthesis_impl_v3 if cfg.D == LANES else _synthesis_impl
    out = impl(flat, gf, cfg, out_len, tile)
    return out[0] if squeeze else out.reshape(*A.shape[:-2], out_len)


def _synthesis_kernel_v4(v_ref, gf_ref, y_ref, vbuf, sems,
                         *, TT, mrows, mr, vrows_pad):
    """rD == 1 OLA fast path.  XLA supplies V = irfft(Y) stored row-major as
    (T·mrows, 128); output row-block b needs plane (j mod mrows) of frame
    b - j for j = 0..mr-1 — mr aligned-dst DMAs at arbitrary row offsets,
    then mr full-block FMAs with the gf row blocks.  No scatter."""
    c = pl.program_id(0)
    i = pl.program_id(1)
    cps = []
    for j in range(mr):
        # frame index (pre-padded by mr-1): t = i*TT + b - j + (mr-1);
        # V row = t*mrows + (j % mrows); stride between b's is mrows rows —
        # load TT*mrows rows starting at b=0 and slice the plane in VMEM.
        off = c * vrows_pad + (i * TT + (mr - 1 - j)) * mrows
        cp = pltpu.make_async_copy(
            v_ref.at[pl.ds(off, TT * mrows), :], vbuf.at[j], sems.at[j]
        )
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()
    acc = jnp.zeros((TT, LANES), jnp.float32)
    for j in range(mr):
        plane = vbuf[j].reshape(TT, mrows, LANES)[:, j % mrows, :]
        acc = acc + gf_ref[j] * plane
    y_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("cfg", "out_len", "TT"))
def _synthesis_impl_v3(A, gf, cfg: FilterbankConfig, out_len: int, TT: int):
    """A: (C, T, K) complex → (C, out_len) float32; requires D == 128."""
    M, D, L = cfg.M, cfg.D, cfg.L
    mr = L // D
    P = L - D
    C, T, _ = A.shape
    mrows = M // LANES
    nb = ((T + mr - 1 + TT - 1) // TT) * TT
    nbpad = ((nb + mr + 8 + 7) // 8) * 8
    V = jnp.fft.irfft(A, M, axis=-1).astype(jnp.float32)        # (C, T, M)
    V = jnp.pad(V, ((0, 0), (mr - 1, nbpad - T - (mr - 1)), (0, 0)))
    vrows_pad = nbpad * mrows
    V = V.reshape(C * vrows_pad, LANES)                          # row-major
    grid = (C, nb // TT)
    y = pl.pallas_call(
        functools.partial(_synthesis_kernel_v4, TT=TT, mrows=mrows, mr=mr,
                          vrows_pad=vrows_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((mr, LANES), lambda c, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TT, LANES), lambda c, i: (c, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, nb, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((mr, TT * mrows, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((mr,)),
        ],
        interpret=use_interpret(),
    )(V, gf.reshape(mr, LANES).astype(jnp.float32))
    yflat = y.reshape(C, -1)
    return jax.lax.dynamic_slice_in_dim(yflat, P, out_len, axis=1)
