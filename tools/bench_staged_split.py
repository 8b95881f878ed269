"""Round-4 VERDICT item 9: measure the LAST named roofline lever —
"move the bf16 hi/lo split to staged inputs".

The fused analysis+beamform kernel's bf16x3 path re-derives Uh/Ul (the
fold output's hi/lo bf16 halves) inside every grid step (_dot3).  The
fold output cannot be split at staging time (it is produced in-kernel),
so the MOST any staging/hoisting restructure could recover is the cost
of the per-step split arithmetic itself (1 subtract + 2 converts per
operand).  This harness bounds that by timing three kernel variants
under the bench protocol (device-resident inputs, CHAIN=1000 inside one
jit, data-dependent scalar readback):

  bf16x3      production (split in-kernel)
  nosplitcost Ul := Uh — identical matmul count, NO split arithmetic
              (wrong numerics; purely a cost bound)
  bf16x2      lo passes dropped entirely (the even-harder upper bound;
              2^-8 accuracy — never adoptable, shown for scale)

Writes the table to stdout; KERNELS.md records the verdict.
Run: /opt/venv/bin/python tools/bench_staged_split.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dsr_tpu.config import ArrayGeometry, FilterbankConfig
    from dsr_tpu.ops import beamforming as jbf
    from dsr_tpu.ops import filterbank as jfb
    from dsr_tpu.ops.pallas import filterbank as pfb
    from golden import room as groom

    SR = 16000.0
    cfg = FilterbankConfig(M=256, m=4, r=2)
    N, CHAIN, NBUF, TT = 64, 1000, 8, 1024
    geom = ArrayGeometry.circular(N, 0.20)
    POS = np.asarray(geom.positions)
    secs = 8.0
    S = int(SR * secs)
    taus = (groom.steering_delays(POS, np.array([0.0, 2.0, 0.0]), 343.0, SR)
            / SR).astype(np.float32)
    hf, gf, delay = jfb.get_prototypes(cfg)
    Gamma = jbf.diffuse_coherence(POS, cfg.M, SR, 343.0)
    w = jbf.mvdr_weights_from_inv(
        jbf.steering_vectors(jnp.asarray(taus), cfg.M, SR),
        jbf.mvdr_precompute(Gamma, 1e-2))
    xs = jax.device_put(np.random.default_rng(0)
                        .standard_normal((NBUF, N, S)).astype(np.float32))
    xp = pfb.stage_for_beamform(xs, cfg, tile=TT)
    xp.block_until_ready()
    hfj = jnp.asarray(hf, jnp.float32)

    orig_dot3 = pfb._dot3

    def dot3_nosplitcost(U, Fc, Fs, acc_re, acc_im):
        f32, bf16 = jnp.float32, jnp.bfloat16
        Uh = U.astype(bf16)
        Ul = Uh                                   # skip subtract+convert
        Fch = Fc.astype(bf16)
        Fcl = (Fc - Fch.astype(f32)).astype(bf16)
        Fsh = Fs.astype(bf16)
        Fsl = (Fs - Fsh.astype(f32)).astype(bf16)
        acc_re = (acc_re
                  + jnp.dot(Uh, Fch, preferred_element_type=f32)
                  + jnp.dot(Uh, Fcl, preferred_element_type=f32)
                  + jnp.dot(Ul, Fch, preferred_element_type=f32))
        acc_im = (acc_im
                  + jnp.dot(Uh, Fsh, preferred_element_type=f32)
                  + jnp.dot(Uh, Fsl, preferred_element_type=f32)
                  + jnp.dot(Ul, Fsh, preferred_element_type=f32))
        return acc_re, acc_im

    def dot3_bf16x2(U, Fc, Fs, acc_re, acc_im):
        f32, bf16 = jnp.float32, jnp.bfloat16
        Uh = U.astype(bf16)
        Fch = Fc.astype(bf16)
        Fcl = (Fc - Fch.astype(f32)).astype(bf16)
        Fsh = Fs.astype(bf16)
        Fsl = (Fs - Fsh.astype(f32)).astype(bf16)
        acc_re = (acc_re + jnp.dot(Uh, Fch, preferred_element_type=f32)
                  + jnp.dot(Uh, Fcl, preferred_element_type=f32))
        acc_im = (acc_im + jnp.dot(Uh, Fsh, preferred_element_type=f32)
                  + jnp.dot(Uh, Fsl, preferred_element_type=f32))
        return acc_re, acc_im

    def run(tag, dot3):
        pfb._dot3 = dot3
        try:
            @jax.jit
            def chain(xp, w):
                def body(i, tot):
                    Y = pfb.analysis_beamform_staged(
                        xp, i % NBUF, w, cfg, S, hfj, tile=TT,
                        precision="bf16x3")
                    y = pfb.synthesis(Y, cfg, S, gf, delay,
                                      precision="bf16x3")
                    return tot + jnp.sum(jnp.abs(y))

                return jax.lax.fori_loop(0, CHAIN, body, 0.0)

            float(chain(xp, w))
            reps = 2
            t0 = time.perf_counter()
            for _ in range(reps):
                float(chain(xp, w))
            dt = (time.perf_counter() - t0) / (reps * CHAIN)
        finally:
            pfb._dot3 = orig_dot3
        print(f"{tag:12s} {dt * 1e3:7.3f} ms/8s-buffer  "
              f"{secs / dt:9.0f} audio-s/s", flush=True)
        return dt

    base = run("bf16x3", orig_dot3)
    nos = run("nosplitcost", dot3_nosplitcost)
    x2 = run("bf16x2", dot3_bf16x2)
    print(f"\nsplit-arithmetic bound: {100 * (base - nos) / base:.1f}% "
          f"of kernel time; whole-lo-pass bound: "
          f"{100 * (base - x2) / base:.1f}%")


if __name__ == "__main__":
    main()
