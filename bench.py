"""Headline benchmark: beamformed audio-sec/s/chip (BASELINE.json metric).

Config-2 style pipeline — 64-channel circular array, oversampled subband
analysis (M=256, m=4, r=2, Pallas streaming kernel), superdirective MVDR
apply, synthesis — on the single available chip.  Prints ONE JSON line.

Measurement protocol (the axon dev runtime makes naive timing lie):
  - inputs are device-resident (the dev tunnel uploads at ~8 MB/s and
    would otherwise measure the tunnel; real arrays produce ~4 MB/s);
  - MVDR weights are precomputed (geometry/steering-dependent only; the
    serving path applies them — re-steering is a cheap matvec via
    `mvdr_precompute`);
  - CHAIN pipelines run inside ONE jit with a scalar readback per call:
    `block_until_ready` returns early through the axon tunnel, so only a
    host readback of a data-dependent scalar bounds the true execution
    time; chaining amortises the ~26 ms dispatch round trip (measured:
    an EMPTY fori_loop body costs 26 ms/call — CHAIN must be ≥100 for
    the dispatch to fall below 10% of the measured time).  Each chain
    step pulls a different device-resident buffer via an i-dependent
    dynamic index, so XLA cannot hoist the work out of the loop.

No published reference numbers exist (BASELINE.json "published": {}), so
vs_baseline is reported against 1× real time.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dsr_tpu.config import ArrayGeometry, FilterbankConfig
    from dsr_tpu.ops import beamforming as jbf
    from dsr_tpu.ops import filterbank as jfb
    from golden import room as groom

    SR = 16000.0
    cfg = FilterbankConfig(M=256, m=4, r=2)
    N = 64
    CHAIN = 100
    NBUF = 8
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
    from dsr_tpu.ops.pallas import filterbank as pfb

    xs = jax.device_put(
        np.random.default_rng(0).standard_normal((NBUF, N, S)).astype(np.float32)
    )
    # Stage once at ingest: the fused kernel addresses buffers by scalar
    # index (production serving keeps audio in this frame layout).
    xp = pfb.stage_for_beamform(xs, cfg, tile=512)
    xp.block_until_ready()
    hfj = jnp.asarray(hf, jnp.float32)

    @jax.jit
    def pipeline_chain(xp, w):
        def body(i, tot):
            # fused analysis+beamform Pallas kernel (bf16x3 DFT matmuls,
            # ~3e-6 rel err vs the f32 unfused path) + synthesis bank
            Y = pfb.analysis_beamform_staged(
                xp, i % NBUF, w, cfg, S, hfj, tile=512, precision="bf16x3"
            )
            y = jfb.synthesis(Y, cfg, S, gf, delay)
            return tot + jnp.sum(jnp.abs(y))

        return jax.lax.fori_loop(0, CHAIN, body, 0.0)

    float(pipeline_chain(xp, w))  # warmup / compile
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        checksum = float(pipeline_chain(xp, w))
    dt = (time.perf_counter() - t0) / (reps * CHAIN)
    audio_sec_per_s = secs / dt
    print(
        json.dumps(
            {
                "metric": "beamformed audio-sec/s/chip (64ch MVDR, M=256 subband)",
                "value": round(audio_sec_per_s, 2),
                "unit": "audio-sec/s/chip",
                "vs_baseline": round(audio_sec_per_s, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
