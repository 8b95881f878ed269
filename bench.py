"""Headline benchmark: beamformed audio-sec/s/chip (BASELINE.json metric).

Runs the config-2 style pipeline — 64-channel circular array, oversampled
subband analysis (M=256, m=4, r=2), superdirective MVDR beamform, synthesis —
on whatever single device JAX provides (TPU under axon; CPU in tests), and
prints ONE JSON line.

No published reference numbers exist (BASELINE.json "published": {}), so
vs_baseline is reported against 1× real time (value == how many seconds of
64-channel audio are beamformed per wall second per chip).
"""

import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax

    from dsr_tpu.config import ArrayGeometry, FilterbankConfig
    from dsr_tpu.ops import beamforming as jbf
    from dsr_tpu.ops import filterbank as jfb
    from golden import room as groom

    SR = 16000.0
    cfg = FilterbankConfig(M=256, m=4, r=2)
    N = 64
    geom = ArrayGeometry.circular(N, 0.20)
    POS = np.asarray(geom.positions)
    secs = 8.0
    S = int(SR * secs)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((N, S)).astype(np.float32)
    taus = (groom.steering_delays(POS, np.array([0.0, 2.0, 0.0]), 343.0, SR) / SR).astype(
        np.float32
    )
    hf, gf, delay = jfb.get_prototypes(cfg)
    Gamma = jbf.diffuse_coherence(POS, cfg.M, SR, 343.0)

    import jax.numpy as jnp

    @jax.jit
    def pipeline(x):
        A = jfb.analysis(x, cfg, hf)
        v = jbf.steering_vectors(jnp.asarray(taus), cfg.M, SR)
        w = jbf.mvdr_weights(v, Gamma, 1e-2)
        Y = jbf.apply_weights(A, w)
        return jfb.synthesis(Y, cfg, S, gf, delay)

    # Device-resident input: the axon development tunnel uploads at only a
    # few MB/s, which would measure the tunnel, not the chip.  (Real arrays
    # produce 64ch×16kHz ≈ 4 MB/s — ingest is never the bottleneck.)
    xd = jax.device_put(x)
    y = pipeline(xd)  # warmup / compile
    y.block_until_ready()
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        y = pipeline(xd)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
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
