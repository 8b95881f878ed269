"""Pallas oversampled-DFT filterbank kernels (HOT LOOP 2, SURVEY.md §3.1).

Why a kernel: the XLA path materialises the (T, L) frame matrix in HBM —
an m·r× read/write amplification of the signal (8× for m=4, r=2).  These
kernels stream the raw signal HBM→VMEM once per tile, do the polyphase
window+fold on the VPU, and evaluate the DFT as MXU matmuls, writing only
the (T, K) subband output back.

STATUS (round 2, v5 kernels): the rD == 1 production path issues ONE
(TT+pad8(Lrows), 128) signal DMA per tile and realises the Lrows window
offsets as in-VMEM sublane rolls (`pltpu.roll` + aligned [0:TT] slice) —
the round-1 kernels' Lrows× HBM read amplification (which saturated DMA at
~400 GB/s effective) is gone; the DFT runs at K−1 = M/2 matmul lanes with
the Nyquist bin as one extra MXU column pass (`_dft_from_planes`), halving
the MXU passes the K = M/2+1 lane padding used to waste.  Synthesis v5
performs the IDFT as in-kernel MXU matmuls (the XLA irfft it replaces cost
more than the whole kernel) and the overlap-add as mr sublane rolls.
Measured 64ch×8s MVDR serving pipeline: fused analysis+beamform 0.23 ms +
synthesis 0.05 ms (CHAIN=1000 honest protocol) vs 31 ms for the unfused
XLA path, err ~4e-6 (bf16x3).  The v2 kernel (general D) survives for
rD > 1 but loses to XLA there — its fold slices land at non-8-aligned
sublane offsets, which Mosaic lowers as per-slice relayouts.

Measured design walls on this toolchain (axon + Mosaic, 2026-08), so the
next session doesn't re-try them:
  - Non-8-aligned sublane slices of VMEM refs (win_ref[j:j+TT] for j not a
    multiple of 8) fail to lower at ALL (UNIMPLEMENTED at run time), both
    as vector loads and as VMEM→VMEM async copies.  The two working row
    shifts are an HBM→VMEM DMA and a `pltpu.roll` along sublanes of a
    loaded value followed by an ALIGNED slice (v5 uses the roll).
  - Dynamic-sublane ref loads with PARTIAL lane slices
    (ref[pl.ds(c, 1), 0:128] of a 129-wide ref) fail to lower
    ("dynamic load with unaligned indices") — split such arrays into
    full-width inputs instead (the (C, K_mm) + (C, 1) weight split).
  - jax.lax.Precision.HIGH has no Mosaic lowering; f32-accurate matmuls
    cheaper than HIGHEST use the manual bf16x3 decomposition (_dot3).
  - The axon dispatch round trip is ~25 ms PER JIT CALL regardless of
    work: any per-iteration timing with CHAIN=100 carries a ~250 µs
    additive floor.  Benchmark kernels this size with CHAIN ≥ 1000.

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


def _fold_rows(buf, hf_ref, TT, Lrows, mrows):
    """Polyphase fold from ONE resident (R0, 128) signal block.

    buf holds rows row0..row0+R0-1; window offset j's (TT, 128) view is a
    sublane roll by -j followed by an ALIGNED [0:TT] slice — the only
    unaligned row shift Mosaic can lower in VMEM (non-8-aligned ref slices
    are UNIMPLEMENTED; see module docstring).  Rolls are factored
    j = q·mrows + pr: the q-rolls are shared across the mrows planes and
    the prototype rows commute with sublane rolls (they are lane vectors),
    so   U_pr = roll(Σ_q roll(buf, -q·mrows)·h[q·mrows+pr], -pr)[0:TT]
    needs Lrows/mrows + mrows - 2 rolls instead of Lrows-1.
    Returns the mrows U-planes.
    """
    R0 = buf.shape[0]
    Vs = [jnp.zeros((R0, LANES), jnp.float32) for _ in range(mrows)]
    for q in range(Lrows // mrows):
        rq = buf if q == 0 else pltpu.roll(buf, R0 - q * mrows, 0)
        for pr in range(mrows):
            Vs[pr] = Vs[pr] + rq * hf_ref[q * mrows + pr][None, :]
    Us = []
    for pr in range(mrows):
        full = Vs[pr] if pr == 0 else pltpu.roll(Vs[pr], R0 - pr, 0)
        Us.append(full[0:TT])
    return Us


def _dft_from_planes(Us, cos_ref, sin_ref, prec):
    """DFT of the folded planes, Nyquist split off the MXU.

    cos/sin refs are (M, K_mm = M/2) — the LAST bin (k = M/2) is NOT a
    matmul column: K = M/2 + 1 would pad the lane dimension to the next
    multiple of 128 and waste up to half the MXU passes.  At k = M/2 the
    twiddle is e^{-jπp} = (-1)^p = (-1)^lane (the plane offset pr·128 is
    even), so the Nyquist bin is one alternating-sign lane reduction on the
    VPU; its imaginary part is exactly 0.  Returns (re (TT, K_mm),
    im (TT, K_mm), nyquist_re (TT, 1))."""
    TT = Us[0].shape[0]
    K_mm = cos_ref.shape[-1]
    acc_re = jnp.zeros((TT, K_mm), jnp.float32)
    acc_im = jnp.zeros((TT, K_mm), jnp.float32)
    for pr, U in enumerate(Us):
        Fc = cos_ref[pl.ds(pr * LANES, LANES), :]
        Fs = sin_ref[pl.ds(pr * LANES, LANES), :]
        if prec == "bf16x3":
            acc_re, acc_im = _dot3(U, Fc, Fs, acc_re, acc_im)
        else:
            acc_re = acc_re + jnp.dot(
                U, Fc, preferred_element_type=jnp.float32, precision=prec,
            )
            acc_im = acc_im + jnp.dot(
                U, Fs, preferred_element_type=jnp.float32, precision=prec,
            )
    # Nyquist on the MXU too: a cross-lane VPU reduction costs ~log₂(128)
    # shuffle rounds per plane; one (TT, 128)@(128, 1) pass is cheaper.
    # The ±1 column is exact in bf16, so a 2-term split of U suffices.
    Usum = Us[0]
    for U in Us[1:]:
        Usum = Usum + U
    alt_col = (1.0 - 2.0 * (
        jax.lax.broadcasted_iota(jnp.int32, (LANES, 1), 0) % 2
    )).astype(jnp.float32)
    if prec == "bf16x3":
        Uh = Usum.astype(jnp.bfloat16)
        Ul = (Usum - Uh.astype(jnp.float32)).astype(jnp.bfloat16)
        ab = alt_col.astype(jnp.bfloat16)
        ny = (jnp.dot(Uh, ab, preferred_element_type=jnp.float32)
              + jnp.dot(Ul, ab, preferred_element_type=jnp.float32))
    else:
        ny = jnp.dot(Usum, alt_col, preferred_element_type=jnp.float32,
                     precision=prec)
    return acc_re, acc_im, ny


def _analysis_kernel_v5(x_ref, hf_ref, cos_ref, sin_ref, re_ref, im_ref, win_ref, sem,
                        *, TT, R0, Lrows, mrows, totalrows, K):
    """rD == 1 fast path, v5: ONE aligned (R0 = TT+pad8(Lrows), 128) DMA per
    tile; the Lrows window offsets are in-VMEM sublane rolls (`_fold_rows`)
    instead of Lrows overlapping DMAs — the HBM read amplification drops
    from Lrows× to (1 + Lrows/TT)×.  The DFT runs at K-1 = M/2 matmul lanes
    with the Nyquist bin as a VPU reduction (`_dft_from_planes`)."""
    c = pl.program_id(0)
    i = pl.program_id(1)
    row0 = c * totalrows + i * TT
    cp = pltpu.make_async_copy(x_ref.at[pl.ds(row0, R0), :], win_ref, sem)
    cp.start()
    cp.wait()
    Us = _fold_rows(win_ref[...], hf_ref, TT, Lrows, mrows)
    acc_re, acc_im, ny = _dft_from_planes(Us, cos_ref, sin_ref, HI)
    K_mm = K - 1
    re_ref[0, :, 0:K_mm] = acc_re
    re_ref[0, :, K_mm:K] = ny
    im_ref[0, :, 0:K_mm] = acc_im
    im_ref[0, :, K_mm:K] = jnp.zeros_like(ny)


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
    R0 = TT + ((Lrows + 7) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (P, total - P - S))).reshape(C * totalrows, LANES)
    cos, sin = _dft_mats(M)
    grid = (C, Tpad // TT)
    re, im = pl.pallas_call(
        functools.partial(
            _analysis_kernel_v5, TT=TT, R0=R0, Lrows=Lrows, mrows=mrows,
            totalrows=totalrows, K=K,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((Lrows, LANES), lambda c, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, K - 1), lambda c, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((M, K - 1), lambda c, i: (0, 0), memory_space=pltpu.VMEM),
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
            pltpu.VMEM((R0, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=use_interpret(),
    )(xp, hf.reshape(Lrows, LANES).astype(jnp.float32),
      jnp.asarray(cos[:, : K - 1]), jnp.asarray(sin[:, : K - 1]))
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
                        wnyr_ref, wnyi_ref, yre_ref, yim_ref, wins_ref, sems,
                        *, TT, R0, Lrows, mrows, totalrows, K, C, prec,
                        nslots=2, cps=1, fold_mode="shared"):
    """Fused analysis + fixed-weight beamform, rD == 1 path (v5).

    Grid is (Ttiles, C) with the channel axis INNERMOST: the (TT, K)
    output block for tile i stays resident in VMEM while every channel's
    conj(w_c)·A_c contribution accumulates into it — the per-channel
    subband tensor (C, T, K) complex64 (132 MB of HBM round trip at 64
    ch × 8 s) is never materialised.  Each channel step issues ONE
    (R0, 128) signal DMA; the Lrows window offsets are in-VMEM sublane
    rolls (`_fold_rows`), so the HBM read amplification is 1 + Lrows/TT
    instead of the v4 kernel's Lrows× (the round-1 DMA saturation wall).
    DMAs are double-buffered across channel steps (issue c+1 before
    computing c).  `idx_ref` is a scalar-prefetched buffer index: x_ref
    may hold several pre-staged utterances (serving batches pad/stage once
    at ingest) and the kernel addresses the selected one — no XLA-side
    gather/pad per call."""
    i = pl.program_id(0)
    g = pl.program_id(1)          # channel GROUP of cps channels
    G = C // cps
    base = idx_ref[0] * (C * totalrows)

    def copy(ch, slot):
        row0 = base + ch * totalrows + i * TT
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(row0, R0), :], wins_ref.at[slot], sems.at[slot]
        )

    @pl.when(g == 0)
    def _prologue():
        for ahead in range(min(nslots - 1, G)):
            for j in range(cps):
                copy(ahead * cps + j, (ahead % nslots) * cps + j).start()

    @pl.when(g + nslots - 1 < G)
    def _prefetch():
        for j in range(cps):
            copy((g + nslots - 1) * cps + j,
                 ((g + nslots - 1) % nslots) * cps + j).start()

    K_mm = K - 1
    tre = tim = tre_n = tim_n = None
    for j in range(cps):
        slot = (g % nslots) * cps + j
        copy(g * cps + j, slot).wait()
        # DFT at K_mm = M/2 matmul lanes (bf16x3: 3-pass bf16
        # decomposition, ~f32 accuracy at half HIGHEST's MXU passes —
        # Mosaic has no HIGH lowering); Nyquist bin as one extra MXU
        # column (_dft_from_planes).  With cps > 1 the folds (VPU) and
        # DFTs (MXU) of the group's channels are independent dataflow,
        # giving the VLIW scheduler room to overlap them.
        if fold_mode == "perplane":
            # measured variant (VERDICT r2 weak #2 idea b): each plane's
            # fold feeds its matmul immediately (rolls NOT shared across
            # planes) so the accumulator never round-trips scheduling
            buf = wins_ref[slot][...]
            R0b = buf.shape[0]
            Us = []
            for pr in range(mrows):
                V = jnp.zeros((R0b, LANES), jnp.float32)
                for q in range(Lrows // mrows):
                    jj = q * mrows + pr
                    rj = buf if jj == 0 else pltpu.roll(buf, R0b - jj, 0)
                    V = V + rj * hf_ref[jj][None, :]
                Us.append(V[0:TT])
            acc_re, acc_im, ny = _dft_from_planes(Us, cos_ref, sin_ref, prec)
        else:
            Us = _fold_rows(wins_ref[slot], hf_ref, TT, Lrows, mrows)
            acc_re, acc_im, ny = _dft_from_planes(Us, cos_ref, sin_ref, prec)
        # weights arrive pre-split: (C, K_mm) matmul bins + (C, 1)
        # Nyquist — Mosaic cannot lower dynamic-sublane loads with
        # partial lane slices, so every ref access is full-lane-width
        c = g * cps + j
        wr = wre_ref[pl.ds(c, 1), :]                   # (1, K_mm)
        wi = wim_ref[pl.ds(c, 1), :]
        wr_n = wnyr_ref[pl.ds(c, 1), :]                # (1, 1)
        wi_n = wnyi_ref[pl.ds(c, 1), :]
        # y += conj(w_c) · A_c  (A_c at Nyquist is purely real)
        yre_c = acc_re * wr + acc_im * wi
        yim_c = acc_im * wr - acc_re * wi
        yre_n = ny * wr_n
        yim_n = -ny * wi_n
        if tre is None:
            tre, tim, tre_n, tim_n = yre_c, yim_c, yre_n, yim_n
        else:
            tre, tim = tre + yre_c, tim + yim_c
            tre_n, tim_n = tre_n + yre_n, tim_n + yim_n

    @pl.when(g == 0)
    def _init():
        yre_ref[:, 0:K_mm] = tre
        yre_ref[:, K_mm:K] = tre_n
        yim_ref[:, 0:K_mm] = tim
        yim_ref[:, K_mm:K] = tim_n

    @pl.when(g != 0)
    def _accum():
        yre_ref[:, 0:K_mm] = yre_ref[:, 0:K_mm] + tre
        yre_ref[:, K_mm:K] = yre_ref[:, K_mm:K] + tre_n
        yim_ref[:, 0:K_mm] = yim_ref[:, 0:K_mm] + tim
        yim_ref[:, K_mm:K] = yim_ref[:, K_mm:K] + tim_n


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


@functools.partial(jax.jit, static_argnames=("cfg", "T", "TT", "prec", "nslots",
                                              "cps", "fold_mode"))
def _analysis_bf_staged(xp, idx, hf, wre, wim, cfg: FilterbankConfig, T: int,
                        TT: int, prec, nslots: int = 2, cps: int = 1,
                        fold_mode: str = "shared"):
    """xp: (B, C·totalrows, 128) staged, idx: scalar int32, w parts: (C, K)
    → y: (T, K) complex64; requires D == 128."""
    M, L = cfg.M, cfg.L
    K = cfg.num_bins
    C = wre.shape[0]
    Lrows = L // LANES
    mrows = M // LANES
    Tpad, totalrows = _stage_geom(cfg, T, TT)
    R0 = TT + ((Lrows + 7) // 8) * 8
    assert xp.shape[1] == C * totalrows and xp.shape[2] == LANES
    cos, sin = _dft_mats(M)
    if C % cps:
        cps = 1
    grid = (Tpad // TT, C // cps)                   # channel axis innermost
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((Lrows, LANES), lambda i, c, idx: (0, 0)),
            pl.BlockSpec((M, K - 1), lambda i, c, idx: (0, 0)),
            pl.BlockSpec((M, K - 1), lambda i, c, idx: (0, 0)),
            pl.BlockSpec((C, K - 1), lambda i, c, idx: (0, 0)),
            pl.BlockSpec((C, K - 1), lambda i, c, idx: (0, 0)),
            pl.BlockSpec((C, 1), lambda i, c, idx: (0, 0)),
            pl.BlockSpec((C, 1), lambda i, c, idx: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TT, K), lambda i, c, idx: (i, 0)),
            pl.BlockSpec((TT, K), lambda i, c, idx: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((nslots * cps, R0, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((nslots * cps,)),
        ],
    )
    re, im = pl.pallas_call(
        functools.partial(
            _analysis_bf_kernel, TT=TT, R0=R0, Lrows=Lrows, mrows=mrows,
            totalrows=totalrows, K=K, C=C, prec=prec, nslots=nslots, cps=cps,
            fold_mode=fold_mode,
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
        jnp.asarray(cos[:, : K - 1]), jnp.asarray(sin[:, : K - 1]),
        wre[:, : K - 1], wim[:, : K - 1],
        wre[:, K - 1 :], wim[:, K - 1 :],
    )
    return jax.lax.complex(re[:T], im[:T])


_PRECS = {"highest": jax.lax.Precision.HIGHEST, "bf16x3": "bf16x3",
          "default": jax.lax.Precision.DEFAULT}


def analysis_beamform_staged(xp: jnp.ndarray, idx, w: jnp.ndarray,
                             cfg: FilterbankConfig, num_samples: int,
                             hf: np.ndarray | None = None, tile: int = 256,
                             precision: str = "highest",
                             cps: int = 0, fold_mode: str = "shared") -> jnp.ndarray:
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
    C = w.shape[1]
    if cps == 0:   # auto: widest channel group dividing C (measured +5%)
        cps = next(c for c in (8, 4, 2, 1) if C % c == 0)
    return _analysis_bf_staged(xp, idx, hf, wre, wim, cfg, T, tile,
                               _PRECS[precision], cps=cps,
                               fold_mode=fold_mode)


def analysis_beamform(x: jnp.ndarray, w: jnp.ndarray, cfg: FilterbankConfig,
                      hf: np.ndarray | None = None, tile: int = 256,
                      precision: str = "highest", cps: int = 0) -> jnp.ndarray:
    """Fused subband analysis + fixed-weight beamform.

    x: (C, S) float32 multi-channel signal; w: (K, C) complex weights
    (`apply_weights` convention) → (T, K) complex64 beamformed subbands,
    equal to `apply_weights(analysis(x), w)` without materialising the
    per-channel (C, T, K) subband tensor.  DS/MVDR serving path
    (time-invariant weights); adaptive beamformers use the unfused path.
    """
    xp = stage_for_beamform(x, cfg, tile)
    return analysis_beamform_staged(xp, 0, w, cfg, x.shape[-1], hf, tile,
                                    precision, cps=cps)


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
              tile: int | None = None, precision: str = "highest") -> jnp.ndarray:
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
    if cfg.D == LANES:
        out = _synthesis_impl_v3(flat, gf, cfg, out_len, tile or 256,
                                 _PRECS[precision])
    else:
        out = _synthesis_impl(flat, gf, cfg, out_len, tile or 16)
    return out[0] if squeeze else out.reshape(*A.shape[:-2], out_len)


def _dot3_single(A, B):
    """bf16x3 matmul with f32 accumulation (drop the Al·Bl term)."""
    f32, bf16 = jnp.float32, jnp.bfloat16
    Ah = A.astype(bf16)
    Al = (A - Ah.astype(f32)).astype(bf16)
    Bh = B.astype(bf16)
    Bl = (B - Bh.astype(f32)).astype(bf16)
    return (
        jnp.dot(Ah, Bh, preferred_element_type=f32)
        + jnp.dot(Al, Bh, preferred_element_type=f32)
        + jnp.dot(Ah, Bl, preferred_element_type=f32)
    )


def _synthesis_kernel_v5(re_ref, im_ref, gf_ref, cosT_ref, sinT_ref, y_ref,
                         sbuf, sems, *, TT, mrows, mr, nbpad, F8, prec):
    """rD == 1 synthesis, v5: the IDFT is MXU matmuls INSIDE the kernel
    (the v4 kernel left it to an XLA irfft that dominated the pipeline),
    and the overlap-add is mr in-VMEM sublane rolls of the frame block —
    spectra are read from HBM exactly once, V never touches HBM.

    Per (c, i) tile: DMA F8 spectra rows (frames i·TT-mr+1 .. i·TT+TT-1,
    pre-padded by mr-1), V = re·cosTᵀ + im·sinTᵀ (scale/sign folded into
    the matrices), then y[b] = Σ_j gf[j] ⊙ V[b + mr-1-j, plane j mod mrows]
    with the frame shift as a roll and the plane as an aligned lane slice.
    """
    c = pl.program_id(0)
    i = pl.program_id(1)
    row0 = c * nbpad + i * TT
    cp_r = pltpu.make_async_copy(re_ref.at[pl.ds(row0, F8), :], sbuf.at[0], sems.at[0])
    cp_i = pltpu.make_async_copy(im_ref.at[pl.ds(row0, F8), :], sbuf.at[1], sems.at[1])
    cp_r.start()
    cp_i.start()
    cp_r.wait()
    cp_i.wait()
    if prec == "bf16x3":
        V = _dot3_single(sbuf[0], cosT_ref[...]) + _dot3_single(sbuf[1], sinT_ref[...])
    else:
        V = jnp.dot(
            sbuf[0], cosT_ref[...], preferred_element_type=jnp.float32, precision=prec,
        ) + jnp.dot(
            sbuf[1], sinT_ref[...], preferred_element_type=jnp.float32, precision=prec,
        )
    acc = jnp.zeros((TT, LANES), jnp.float32)
    for j in range(mr):
        s = mr - 1 - j
        Vs = V if s == 0 else pltpu.roll(V, F8 - s, 0)
        lo = (j % mrows) * LANES
        plane = Vs[0:TT, lo:lo + LANES]
        acc = acc + gf_ref[j][None, :] * plane
    y_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("cfg", "out_len", "TT", "prec"))
def _synthesis_impl_v3(A, gf, cfg: FilterbankConfig, out_len: int, TT: int,
                       prec=HI):
    """A: (C, T, K) complex → (C, out_len) float32; requires D == 128."""
    M, D, L = cfg.M, cfg.D, cfg.L
    mr = L // D
    K = cfg.num_bins
    P = L - D
    C, T, _ = A.shape
    mrows = M // LANES
    nb = ((T + mr - 1 + TT - 1) // TT) * TT
    nbpad = ((nb + mr + 8 + 7) // 8) * 8
    Kp = ((K + LANES - 1) // LANES) * LANES
    F8 = ((TT + mr + 7) // 8) * 8
    re = jnp.pad(jnp.real(A).astype(jnp.float32),
                 ((0, 0), (mr - 1, nbpad - T - (mr - 1)), (0, Kp - K)))
    im = jnp.pad(jnp.imag(A).astype(jnp.float32),
                 ((0, 0), (mr - 1, nbpad - T - (mr - 1)), (0, Kp - K)))
    re = re.reshape(C * nbpad, Kp)
    im = im.reshape(C * nbpad, Kp)
    # IDFT matrices with the irfft scale/sign folded in; zero rows for the
    # lane-padded bins
    p = np.arange(M)[None, :]
    k = np.arange(K)[:, None]
    ang = 2.0 * np.pi * p * k / M
    scale = np.full((K, 1), 2.0 / M, np.float32)
    scale[0] = 1.0 / M
    if M % 2 == 0:
        scale[-1] = 1.0 / M
    cosT = np.zeros((Kp, M), np.float32)
    sinT = np.zeros((Kp, M), np.float32)
    cosT[:K] = np.cos(ang) * scale
    sinT[:K] = -np.sin(ang) * scale
    grid = (C, nb // TT)
    y = pl.pallas_call(
        functools.partial(_synthesis_kernel_v5, TT=TT, mrows=mrows, mr=mr,
                          nbpad=nbpad, F8=F8, prec=prec),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((mr, LANES), lambda c, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, M), lambda c, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, M), lambda c, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TT, LANES), lambda c, i: (c, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, nb, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, F8, Kp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=use_interpret(),
    )(re, im, gf.reshape(mr, LANES).astype(jnp.float32),
      jnp.asarray(cosT), jnp.asarray(sinT))
    yflat = y.reshape(C, -1)
    return jax.lax.dynamic_slice_in_dim(yflat, P, out_len, axis=1)
