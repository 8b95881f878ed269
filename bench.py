"""Headline benchmark: beamformed audio-sec/s/chip (BASELINE.json metric)
plus LVCSR decode RTF (config 4) and roofline accounting, one JSON line.

Config-2 style pipeline — 64-channel circular array, oversampled subband
analysis fused with superdirective MVDR apply (M=256, m=4, r=2, Pallas v5
kernels), synthesis — on the single available chip; then batched top-K
decode over the synthetic large-vocab trigram HCLG (config 4).

Measurement protocol (the axon dev runtime makes naive timing lie):
  - inputs are device-resident (the dev tunnel uploads at ~8 MB/s and
    would otherwise measure the tunnel; real arrays produce ~4 MB/s);
  - MVDR weights are precomputed (geometry/steering-dependent only; the
    serving path applies them — re-steering is a cheap matvec via
    `mvdr_precompute`);
  - CHAIN pipelines run inside ONE jit with a scalar readback per call:
    `block_until_ready` returns early through the axon tunnel, so only a
    host readback of a data-dependent scalar bounds the true execution
    time.  The dispatch round trip is ~25 ms PER JIT CALL regardless of
    work (measured: an EMPTY fori_loop body costs the same 25 ms), i.e.
    a CHAIN=N loop carries a 25/N ms additive floor per iteration — with
    the v5 kernels at ~0.3 ms/iteration CHAIN must be ≥1000 for the floor
    to fall below 10%.  Each chain step pulls a different device-resident
    buffer via an i-dependent dynamic index, so XLA cannot hoist the work
    out of the loop.
  - the decoder is a fixed-shape lax.scan (identical compute for any
    loglik values), so synthetic loglik measures true decode throughput.

Roofline (BASELINE.md "speed-of-light per chip"): the beamform pipeline's
floor is max(HBM bytes moved / peak BW, executed MXU FLOPs / peak);
`fraction_of_roofline` = floor_time / achieved_time.  Executed FLOPs count
the bf16x3 3-pass decomposition the hardware actually runs.  The decoder
is sort/gather-bound, not stream-bound, so it reports RTF instead of a
bandwidth fraction.

No published reference numbers exist (BASELINE.json "published": {}), so
vs_baseline is reported against 1× real time.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

V5E_HBM_GBPS = 819.0          # v5e HBM peak
V5E_BF16_TFLOPS = 197.0       # v5e MXU bf16 peak
# VPU peak (elementwise f32 lane-ops/s): 8x128 vregs x 4 ALUs at ~1.74 GHz.
# Used for the decode roofline's bitonic-stage floor (KERNELS.md round 5).
V5E_VPU_OPS = 1.74e9 * 8 * 128 * 4


def decode_roofline(U, kcap, num_pdfs, n_cand, gather_bytes_per_utt,
                    frame_us, q=16):
    """Speed-of-light model of the token-passing frame loop (round-4
    VERDICT item 4: the decode analogue of the beamform roofline).

    Floors per frame for the whole U-utterance batch:
      - HBM: the packed arc-row gathers (the only O(candidates) HBM
        traffic; tables are far beyond VMEM) + the ll row + token writes;
      - MXU: the one-hot acoustic lookup's two bf16 passes (useful FLOPs
        = 2·2·n_cand·P — the systolic array pads the matvec, but a floor
        counts the work the algorithm REQUIRES);
      - VPU: the select kernel's bitonic compare-exchange stages: 28
        presort stages on (U·R,128) + 2 flat sorts (66 stages at the
        q=16 pool) on (U·qr,128), 3 planes, ~5 lane-ops per element per
        stage (2 rolls + compare + 2 selects).
    The achieved/floor gap is attributed in KERNELS.md (per-op fixed
    costs of the ~30-op scan body dominate, not bandwidth or compute).
    """
    from dsr_tpu.ops.pallas.select import _shape_plan

    bytes_moved = U * (gather_bytes_per_utt + num_pdfs * 4 + 3 * kcap * 4)
    flops = U * 2 * 2 * n_cand * num_pdfs
    R, qr = _shape_plan(n_cand, q)
    import math
    lg = int(math.log2(qr * 128))
    flat_stages = lg * (lg + 1) // 2
    vpu_ops = (28 * U * R * 128 + 2 * flat_stages * U * qr * 128) * 3 * 5
    t_bw_us = bytes_moved / (V5E_HBM_GBPS * 1e9) * 1e6
    t_mxu_us = flops / (V5E_BF16_TFLOPS * 1e12) * 1e6
    t_vpu_us = vpu_ops / V5E_VPU_OPS * 1e6
    sol = max(t_bw_us, t_mxu_us, t_vpu_us)
    bound = {t_bw_us: "hbm", t_mxu_us: "mxu", t_vpu_us: "vpu"}[sol]
    return {
        "hbm_bytes": bytes_moved, "mxu_flops": flops, "vpu_ops": vpu_ops,
        "t_bw_us": round(t_bw_us, 2), "t_mxu_us": round(t_mxu_us, 2),
        "t_vpu_us": round(t_vpu_us, 2), "achieved_us_per_frame": round(frame_us, 2),
        "fraction_of_roofline": round(sol / frame_us, 4), "bound": bound,
    }


def bench_beamform(jax, jnp):
    from dsr_tpu.config import ArrayGeometry, FilterbankConfig
    from dsr_tpu.ops import beamforming as jbf
    from dsr_tpu.ops import filterbank as jfb
    from dsr_tpu.ops.pallas import filterbank as pfb
    from golden import room as groom

    SR = 16000.0
    cfg = FilterbankConfig(M=256, m=4, r=2)
    N = 64
    # cps (channels per grid step) override for the KERNELS.md round-5
    # bisection of the r3->r4 -2%; 0 = the production auto choice
    CPS = int(os.environ.get("BENCH_BF_CPS", "0"))
    CHAIN = 1000
    NBUF = 8
    TT = 1024
    geom = ArrayGeometry.circular(N, 0.20)
    POS = np.asarray(geom.positions)
    secs = 8.0
    S = int(SR * secs)
    taus = (groom.steering_delays(POS, np.array([0.0, 2.0, 0.0]), 343.0, SR) / SR).astype(
        np.float32
    )
    hf, gf, delay = jfb.get_prototypes(cfg)
    Gamma = jbf.diffuse_coherence(POS, cfg.M, SR, 343.0)
    Ginv = jbf.mvdr_precompute(Gamma, 1e-2)
    w = jbf.mvdr_weights_from_inv(
        jbf.steering_vectors(jnp.asarray(taus), cfg.M, SR), Ginv
    )
    xs = jax.device_put(
        np.random.default_rng(0).standard_normal((NBUF, N, S)).astype(np.float32)
    )
    # Stage once at ingest: the fused kernel addresses buffers by scalar
    # index (production serving keeps audio in this frame layout).
    xp = pfb.stage_for_beamform(xs, cfg, tile=TT)
    xp.block_until_ready()
    hfj = jnp.asarray(hf, jnp.float32)

    @jax.jit
    def pipeline_chain(xp, w):
        def body(i, tot):
            # fused analysis+beamform Pallas kernel (bf16x3 DFT matmuls,
            # ~4e-6 rel err vs the f32 unfused path) + synthesis kernel
            # (in-kernel IDFT matmuls + roll OLA)
            Y = pfb.analysis_beamform_staged(
                xp, i % NBUF, w, cfg, S, hfj, tile=TT, precision="bf16x3",
                cps=CPS,
            )
            y = pfb.synthesis(Y, cfg, S, gf, delay, precision="bf16x3")
            return tot + jnp.sum(jnp.abs(y))

        return jax.lax.fori_loop(0, CHAIN, body, 0.0)

    float(pipeline_chain(xp, w))  # warmup / compile
    # >=5 timed reps with per-rep spread (round-4 VERDICT weak #3: the
    # headline moved -2% r3->r4 on single samples; report variance)
    reps = 5
    per_rep = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(pipeline_chain(xp, w))
        per_rep.append((time.perf_counter() - t0) / CHAIN)
    dt = float(np.mean(per_rep))
    audio_sec_per_s = secs / dt
    rep_aus = sorted(secs / t for t in per_rep)

    # ---- roofline model ---------------------------------------------------
    K = cfg.num_bins
    T = jfb.num_frames(S, cfg)
    Tpad = ((T + TT - 1) // TT) * TT
    Lrows = cfg.L // 128
    mr = cfg.L // cfg.D
    ST = 256                                  # synthesis tile
    nb = ((T + mr - 1 + ST - 1) // ST) * ST
    # HBM bytes: staged-signal read (+overlap), fused re/im write, synth
    # prep read+write (pad to Kp lanes), spectra read in-kernel, y write
    R0 = TT + ((Lrows + 7) // 8) * 8
    Kp = 256
    bytes_moved = (
        (Tpad // TT) * N * R0 * 128 * 4        # fused signal DMAs
        + 2 * Tpad * K * 4                     # fused output write
        + 2 * T * K * 4 + 2 * nb * Kp * 4      # synth prep read + write
        + 2 * nb * Kp * 4                      # synth kernel spectra DMAs
        + nb * 128 * 4                         # y write
    )
    # executed MXU FLOPs (bf16x3 = 3 passes; ny = 2 thin passes ~ small)
    mrows = cfg.M // 128
    fused_flops = (Tpad // TT) * N * (mrows * 2 * 3) * (2 * TT * 128 * (K - 1))
    synth_flops = (nb // ST) * (2 * 3) * (2 * (ST + mr) * Kp * cfg.M)
    flops = fused_flops + synth_flops
    t_bw = bytes_moved / (V5E_HBM_GBPS * 1e9)
    t_mxu = flops / (V5E_BF16_TFLOPS * 1e12)
    sol = max(t_bw, t_mxu)
    return {
        "audio_sec_per_s": round(audio_sec_per_s, 2),
        "audio_sec_per_s_reps": [round(a, 1) for a in rep_aus],
        "ms_per_8s_buffer": round(dt * 1e3, 3),
        "fraction_of_roofline": round(sol / dt, 3),
        "roofline": {
            "hbm_bytes": bytes_moved,
            "mxu_flops": flops,
            "t_bw_us": round(t_bw * 1e6, 1),
            "t_mxu_us": round(t_mxu * 1e6, 1),
            "bound": "mxu" if t_mxu > t_bw else "hbm",
        },
    }


def bench_decode(jax, jnp):
    """Monophone LVCSR decode.  Round-5 adoption: the a0=2 degree-split
    layout un-neutralises the split decoder on THIS graph too (mean
    out-degree 2.44 — round 3's NEUTRAL verdict was an A0=8 artifact):
    477/527 au-s/s at q=16/8 vs the dense-kernel path's 393/425, eg=896
    certificate-clean (ovf=0, spill=0) on real in-domain loglik
    (KERNELS.md round-5 A0 sweep)."""
    from dsr_tpu.asr import lvcsr
    from dsr_tpu.asr.decoder import split_decoder as sd
    from dsr_tpu.asr.decoder import topk_decoder as tk

    task = lvcsr.build_task(lvcsr.LvcsrConfig())  # ~0.5M states / ~1M arcs
    g = tk.build_token_graph(task.graph)
    sg = sd.build_split_graph(task.graph, a0=2)
    U, T = 8, 1000                                # 8 utts x 8 s @ 125 fps
    rng = np.random.default_rng(0)
    ll = jax.device_put(rng.standard_normal((U, T, task.num_pdfs)).astype(np.float32))
    lens = jax.device_put(np.full(U, T, np.int32))
    audio = U * T / 125.0
    kcap, eg = 256, 896

    def run_split(q):
        out = sd.decode_batch_split(sg, ll, lens, kcap=kcap, beam=40.0,
                                    eg=eg, select_q=q)
        float(jnp.sum(out[1]))                    # warmup / compile
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = sd.decode_batch_split(sg, ll, lens, kcap=kcap, beam=40.0,
                                        eg=eg, select_q=q)
            float(jnp.sum(out[1]))
        return (time.perf_counter() - t0) / reps, out

    def run_dense(**kw):
        out = tk.decode_batch(g, ll, lens, kcap=kcap, beam=40.0, **kw)
        float(jnp.sum(out[1]))                    # warmup / compile
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = tk.decode_batch(g, ll, lens, kcap=kcap, beam=40.0, **kw)
            float(jnp.sum(out[1]))
        return (time.perf_counter() - t0) / reps, out

    # production path: a0=2 degree-split + Pallas select
    dt, out = run_split(16)
    dt8, out8 = run_split(8)
    dtd, outd = run_dense(select_mode="pallas", select_q=16, return_spill=True)
    dtx, _ = run_dense(select_mode="xla")
    roof = decode_roofline(
        U, kcap, task.num_pdfs, (kcap + eg) * sg.a0,
        (kcap * (3 * sg.a0 + 2) + eg * 3 * sg.a0) * 4, dt / T * 1e6)
    return {
        "audio_sec_per_s": round(audio / dt, 2),
        "rtf": round(dt / audio, 5),
        "fraction_of_roofline": roof["fraction_of_roofline"],
        "roofline": roof,
        "graph": {"states": g.num_states, "arcs": int(task.build_stats["num_arcs"]),
                  "a_max": g.a_max, "a0": sg.a0, "kcap": kcap, "eg": eg},
        "path": "degree-split a0=2 + Pallas select q=16",
        "select": {
            "spill_frames": int(np.asarray(out[2]).sum()),
            "overflow_frames": int(np.asarray(out[3]).sum()),
            "split_q8_audio_sec_per_s": round(audio / dt8, 2),
            "split_q8_spill_frames": int(np.asarray(out8[2]).sum()),
            "dense_pallas_q16_audio_sec_per_s": round(audio / dtd, 2),
            "dense_pallas_q16_spill_frames": int(np.asarray(outd[2]).sum()),
            "xla_sort_audio_sec_per_s": round(audio / dtx, 2),
        },
    }


def bench_decode_tri(jax, jnp):
    """Context-dependent LVCSR decode (the realistic config): tied-
    triphone HCLG (213k states, a_max=263) through the DEGREE-SPLIT
    decoder + select kernel at the accuracy-safe kcap=512 (PRUNING.md
    round-4 table: WER identical to dense-exact at every setting).

    Round-5 adoption: a0=4 main tables (mean out-degree 3.95 means the
    8-arc table was ~50% padding) + eg=640/384 — 1.41x/1.65x over the
    round-4 a0=8 layout at kcap=512/256, certificates clean on real
    logliks (KERNELS.md A0 sweep)."""
    from dsr_tpu.asr import lvcsr
    from dsr_tpu.asr.decoder import split_decoder as sd

    task = lvcsr.build_task_tri()
    sg = sd.build_split_graph(task.graph, a0=4)
    U, T = 8, 1000
    rng = np.random.default_rng(0)
    ll = jax.device_put(rng.standard_normal((U, T, task.num_pdfs)).astype(np.float32))
    lens = jax.device_put(np.full(U, T, np.int32))
    audio = U * T / 125.0

    def run(kcap, eg):
        out = sd.decode_batch_split(sg, ll, lens, kcap=kcap, beam=60.0, eg=eg)
        float(jnp.sum(out[1]))                    # warmup / compile
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = sd.decode_batch_split(sg, ll, lens, kcap=kcap, beam=60.0,
                                        eg=eg)
            float(jnp.sum(out[1]))
        return (time.perf_counter() - t0) / reps, out

    a_max = int(np.bincount(task.graph.src, minlength=sg.num_states).max())
    dt512, out512 = run(512, 640)
    dt256, out256 = run(256, 384)

    def run_q8(kcap, eg):
        out = sd.decode_batch_split(sg, ll, lens, kcap=kcap, beam=60.0,
                                    eg=eg, select_q=8)
        float(jnp.sum(out[1]))
        t0 = time.perf_counter()
        for _ in range(3):
            out = sd.decode_batch_split(sg, ll, lens, kcap=kcap, beam=60.0,
                                        eg=eg, select_q=8)
            float(jnp.sum(out[1]))
        return (time.perf_counter() - t0) / 3, out

    dt512q8, out512q8 = run_q8(512, 640)
    kcap, eg = 512, 640
    roof = decode_roofline(
        U, kcap, task.num_pdfs, (kcap + eg) * sg.a0,
        (kcap * (3 * sg.a0 + 2) + eg * 3 * sg.a0) * 4, dt512 / T * 1e6)
    return {
        "audio_sec_per_s": round(audio / dt512, 2),
        "rtf": round(dt512 / audio, 5),
        "fraction_of_roofline": roof["fraction_of_roofline"],
        "roofline": roof,
        "graph": {"states": sg.num_states, "overflow_groups": sg.num_groups,
                  "a_max": a_max, "a0": sg.a0, "kcap": 512, "eg": 640},
        "path": "degree-split a0=4 + Pallas select q=16",
        "kcap256_audio_sec_per_s": round(audio / dt256, 2),
        "overflow_frames": int(np.asarray(out512[3]).sum()),
        # q=8: WER measured identical (0.00%/3.61% at kcap 512/256, real
        # loglik) but the conservative spill certificate fires on most
        # frames (7301/~9000 at kcap=512) — faster, NOT certified exact
        "split_q8_audio_sec_per_s": round(audio / dt512q8, 2),
        "split_q8_spill_frames": int(np.asarray(out512q8[2]).sum()),
    }


def main():
    import jax
    import jax.numpy as jnp

    bf = bench_beamform(jax, jnp)
    try:
        dec = bench_decode(jax, jnp)
    except Exception as e:  # graph build needs the native core; never
        dec = {"error": repr(e)}  # silently drop the headline metric
    try:
        tri = bench_decode_tri(jax, jnp)
    except Exception as e:
        tri = {"error": repr(e)}
    print(
        json.dumps(
            {
                "metric": "beamformed audio-sec/s/chip (64ch MVDR, M=256 subband)",
                "value": bf["audio_sec_per_s"],
                "unit": "audio-sec/s/chip",
                "vs_baseline": bf["audio_sec_per_s"],
                "reps_min_max": [bf["audio_sec_per_s_reps"][0],
                                 bf["audio_sec_per_s_reps"][-1]],
                "fraction_of_roofline": bf["fraction_of_roofline"],
                "roofline": bf["roofline"],
                "extra_metrics": [
                    {
                        "metric": "LVCSR decode audio-sec/s/chip "
                                  "(large-vocab trigram HCLG, top-K token passing)",
                        "unit": "audio-sec/s/chip",
                        **dec,
                    },
                    {
                        "metric": "triphone LVCSR decode audio-sec/s/chip "
                                  "(tied-triphone HCLG, degree-split + select "
                                  "kernel, accuracy-safe kcap=512)",
                        "unit": "audio-sec/s/chip",
                        **tri,
                    },
                ],
            }
        )
    )


if __name__ == "__main__":
    main()
