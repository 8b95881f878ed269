"""Round-4 VERDICT item 2: per-stage numbers for the degree-split
FUSION decision on the MONOPHONE bench graph (532k states, a_max=47),
where the naive split measured NEUTRAL in round 3 (the ragged expansion's
~15 XLA ops offset the 2.9x pool shrink).

Three on-chip timings, U=8 x T=1000 batched:

  dense     production dense + select kernel (the 397 audio-s/s path)
  split     degree-split decode (main + overflow expansion + kernel)
  mainonly  the SPLIT step with the overflow expansion DELETED
            (candidates = the 8-arc main table only — WRONG results for
            high-degree states, purely the op-floor of the split step)

`split - mainonly` is exactly what fusing the expansion into the select
kernel (scalar-prefetched group DMAs) could reclaim; `mainonly` is the
fusion's best-case end-to-end time.  KERNELS.md records the verdict.

Run: /opt/venv/bin/python tools/bench_split_stages.py
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from dsr_tpu.asr import lvcsr
    from dsr_tpu.asr.decoder import split_decoder as sd
    from dsr_tpu.asr.decoder import topk_decoder as tk
    from dsr_tpu.asr.decoder.topk_decoder import NEG, _split_mm
    from dsr_tpu.ops.pallas import select as _sel

    task = lvcsr.build_task(lvcsr.LvcsrConfig())
    tg = tk.build_token_graph(task.graph)
    sg = sd.build_split_graph(task.graph)
    U, T = 8, 1000
    rng = np.random.default_rng(0)
    ll = jax.device_put(rng.standard_normal((U, T, task.num_pdfs)).astype(np.float32))
    lens = jax.device_put(np.full(U, T, np.int32))
    audio = U * T / 125.0
    A0 = sd.A0

    @functools.partial(jax.jit, static_argnames=("kcap",))
    def mainonly_batch(ll, lens, packed, final_w, start, *, kcap):
        P = ll.shape[-1]
        iota_p = jnp.arange(P, dtype=jnp.int32)

        def one(llu, ln):
            def step(carry, inp):
                states, scores = carry
                t, l1 = inp
                rows = packed[states]
                w_m = rows[:, :A0]
                pdf_m = rows[:, A0:2 * A0].astype(jnp.int32)
                dst_m = rows[:, 2 * A0:3 * A0].astype(jnp.int32)
                ohp = (pdf_m[..., None] == iota_p[None, None, :]).astype(jnp.float32)
                llv = _split_mm(ohp, l1, "kap,p->ka")
                cand = scores[:, None] + w_m + llv
                arc_ids = (states[:, None] * A0 + jnp.arange(A0)[None, :])
                ns, nd, na, sp = _sel.recombine_topk(
                    cand.reshape(-1), dst_m.reshape(-1), arc_ids.reshape(-1),
                    jnp.float32(40.0), kcap=kcap, q=16)
                alive = ns > NEG / 2
                keep = t < ln
                so = jnp.where(keep, jnp.where(alive, nd, 0), states)
                sc = jnp.where(keep, ns, scores)
                return (so, sc), sc[0]

            states0 = jnp.zeros((kcap,), jnp.int32).at[0].set(start)
            scores0 = jnp.full((kcap,), NEG, jnp.float32).at[0].set(0.0)
            (sf, scf), _ = jax.lax.scan(step, (states0, scores0),
                                        (jnp.arange(T), llu))
            return jnp.max(scf)

        return jax.vmap(one)(ll, lens)

    def timeit(fn):
        float(np.asarray(fn()).sum())
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            float(np.asarray(fn()).sum())
        return (time.perf_counter() - t0) / reps

    dt_dense = timeit(lambda: tk.decode_batch(
        tg, ll, lens, kcap=256, beam=40.0, select_mode="pallas",
        select_q=16)[1])
    dt_split = timeit(lambda: sd.decode_batch_split(
        sg, ll, lens, kcap=256, beam=40.0, eg=256)[1])
    dt_main = timeit(lambda: mainonly_batch(
        ll, lens, sg.packed, sg.final_weight, sg.start, kcap=256))

    us = lambda dt: dt / T * 1e6
    print(f"dense+kernel    {us(dt_dense):7.1f} us/frame  "
          f"{audio / dt_dense:7.1f} audio-s/s")
    print(f"split (eg=256)  {us(dt_split):7.1f} us/frame  "
          f"{audio / dt_split:7.1f} audio-s/s")
    print(f"main-only floor {us(dt_main):7.1f} us/frame  "
          f"{audio / dt_main:7.1f} audio-s/s   (fusion best case)")
    print(f"\nexpansion cost {us(dt_split - dt_main):.1f} us/frame; "
          f"fusion ceiling vs dense: {dt_dense / dt_main:.2f}x")


if __name__ == "__main__":
    main()
