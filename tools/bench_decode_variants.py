"""On-chip component breakdown + variant matrix for the LVCSR decode frame
loop (SURVEY.md §3.3 HOT LOOP 3 — the last north-star kernel clause).

Measures, at the bench configuration (U=8 utterances vmapped, T=1000
frames, kcap=256, beam=40, 532k-state trigram HCLG, A_max=47 → 12k
candidates/frame/utt), the per-frame cost of:

  exact      the production step: row-gather arc tables, one-hot MXU
             acoustic lookup, lexicographic (dst,-score) sort-recombine,
             beam prune, exact top_k
  ablations  the same step with one component knocked out (cost of the
             component = difference vs `exact`):
               noll     llv = 0 (no acoustic lookup)
               nosort   no recombination sort (top_k over raw candidates)
               notopk   sort but slice the first kcap instead of top_k
               floor    neither sort nor top_k (slice) — scan skeleton
  variants   candidate replacements (wrong results allowed for ablations,
             variants must be usable):
               approx     jax.lax.approx_max_k(recall 0.95) for top_k
               precapP    prune-first: top_k(12k -> P) raw candidates
                          (NO dedup), then sort the P by (dst,-score),
                          dedup, top_k(P -> kcap).  Exact iff every
                          dedup winner that makes the final kcap sits in
                          the raw top-P; measured recall below.
               gatherll   llv = ll[pdfr] element gather (the rejected
                          HOT LOOP 4 path, for the record)

Honest protocol: one jit per variant runs the whole T=1000-frame scan
(decode work 300+ ms >> 25 ms dispatch floor, which is measured and
subtracted anyway); data-dependent scalar readback bounds execution.

Run: /opt/venv/bin/python tools/bench_decode_variants.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

KCAP = 256
BEAM = 40.0
U, T = 8, 1000
NEG = -1e30



def build(mode, g, P, precap=1024):
    """Jitted decode fn(ll, packed) for one frame-loop variant (see module
    docstring).  Exposed for the HLO-dump diagnostic tool."""
    import jax
    import jax.numpy as jnp
    from dsr_tpu.asr.decoder import topk_decoder as tk

    A = g.a_max
    iota_p = jnp.arange(P, dtype=jnp.int32)
    if True:
        def step(carry, llt, packed):
            states, scores = carry
            rows = packed[states]                       # (kcap, 3A) row gather
            w = rows[:, :A]
            pdfr = rows[:, A:2 * A].astype(jnp.int32)
            cdst = rows[:, 2 * A:].astype(jnp.int32)
            if mode == "noll":
                llv = 0.0
            elif mode == "noll2":
                # data-dependent on llt but NO lookup: fixed slice broadcast
                llv = llt[:A][None, :]
            elif mode == "noll3":
                # lookup present but with CONSTANT indices (pdfr ignored)
                iota_a = jnp.arange(A, dtype=jnp.int32) % P
                ohp = (iota_a[None, :, None] == iota_p[None, None, :]
                       ).astype(jnp.float32)
                llv = tk._split_mm(ohp, llt, "kap,p->ka")
            elif mode == "noll4":
                # pdfr-shaped compare but against a constant table value
                llv = jnp.where(pdfr < P // 2, llt[0], llt[1])
            elif mode == "gatherll":
                llv = llt[pdfr]
            elif mode == "exactpad":
                # ll pre-padded to 128 lanes: the per-frame scan slice is
                # tile-aligned; one-hot built against the full 128 lanes
                i128 = jnp.arange(128, dtype=jnp.int32)
                ohp = (pdfr[..., None] == i128[None, None, :]).astype(jnp.float32)
                llv = tk._split_mm(ohp, llt, "kap,p->ka")
            elif mode == "llbf16":
                # one-hot born bf16 (never an f32 materialisation)
                ohp = (pdfr[..., None] == iota_p[None, None, :]).astype(jnp.bfloat16)
                th = llt.astype(jnp.bfloat16)
                tl = (llt - th.astype(jnp.float32)).astype(jnp.bfloat16)
                llv = (jnp.einsum("kap,p->ka", ohp, th,
                                  preferred_element_type=jnp.float32)
                       + jnp.einsum("kap,p->ka", ohp, tl,
                                    preferred_element_type=jnp.float32))
            elif mode == "llscan":
                # 120-step select-accumulate: no one-hot tensor at all
                def acc(p, a):
                    return a + jnp.where(pdfr == p, llt[p], 0.0)
                llv = jax.lax.fori_loop(0, P, acc,
                                        jnp.zeros(pdfr.shape, jnp.float32))
            elif mode == "llmm1":
                # P<=128: flat candidates x one-lane-row one-hot, ONE matmul
                # with hi|lo bf16 table columns (exact ids, ~2^-17 table)
                fp = pdfr.reshape(-1, 1).astype(jnp.int32)       # (K*A, 1)
                lanes = jnp.arange(128, dtype=jnp.int32)[None, :]
                oh = (fp == lanes).astype(jnp.bfloat16)          # (K*A, 128)
                llp = jnp.zeros((128,), llt.dtype).at[:P].set(llt)
                th = llp.astype(jnp.bfloat16)
                tl = (llp - th.astype(jnp.float32)).astype(jnp.bfloat16)
                tab = jnp.stack([th, tl], axis=1)                # (128, 2)
                lv = jnp.dot(oh, tab, preferred_element_type=jnp.float32)
                llv = (lv[:, 0] + lv[:, 1]).reshape(KCAP, A)
            else:
                ohp = (pdfr[..., None] == iota_p[None, None, :]).astype(jnp.float32)
                llv = tk._split_mm(ohp, llt, "kap,p->ka")
            cand = scores[:, None] + w + llv
            flat = cand.reshape(-1)
            fdst = cdst.reshape(-1)
            arc_ids = (states[:, None] * A
                       + jax.lax.broadcasted_iota(jnp.int32, (KCAP, A), 1)
                       ).reshape(-1)

            if mode == "nosort":
                mx = jnp.max(flat)
                val = jnp.where(flat > mx - BEAM, flat, NEG)
                new_scores, idx = jax.lax.top_k(val, KCAP)
                sd, sa = fdst, arc_ids
            elif mode == "precap":
                mx = jnp.max(flat)
                val = jnp.where(flat > mx - BEAM, flat, NEG)
                pv, pidx = jax.lax.top_k(val, precap)   # raw top-P, no dedup
                pd = fdst[pidx]
                pa = arc_ids[pidx]
                sd, sneg, sa = jax.lax.sort((pd, -pv, pa), num_keys=2)
                first = jnp.concatenate([jnp.ones((1,), bool), sd[1:] != sd[:-1]])
                val2 = jnp.where(first, -sneg, NEG)
                new_scores, idx = jax.lax.top_k(val2, KCAP)
                sd, sa = sd[idx], sa[idx]
                idx = None
            else:
                sd, sneg, sa = jax.lax.sort((fdst, -flat, arc_ids), num_keys=2)
                first = jnp.concatenate([jnp.ones((1,), bool), sd[1:] != sd[:-1]])
                val = jnp.where(first, -sneg, NEG)
                mx = jnp.max(val)
                val = jnp.where(val > mx - BEAM, val, NEG)
                if mode in ("notopk", "floor"):
                    new_scores, idx = val[:KCAP], None
                elif mode == "approx":
                    new_scores, idx = jax.lax.approx_max_k(
                        val, KCAP, recall_target=0.95)
                else:
                    new_scores, idx = jax.lax.top_k(val, KCAP)

            alive = new_scores > NEG / 2
            if idx is None:
                if mode in ("notopk", "floor"):
                    ns, sa_k = sd[:KCAP], sa[:KCAP]
                else:
                    ns, sa_k = sd, sa
            else:
                ns, sa_k = sd[idx], sa[idx]
            new_states = jnp.where(alive, ns, 0).astype(jnp.int32)
            return (new_states, new_scores), jnp.where(alive, sa_k, -1)

        def step_floor(carry, llt, packed):
            states, scores = carry
            rows = packed[states]
            w = rows[:, :A]
            pdfr = rows[:, A:2 * A].astype(jnp.int32)
            ohp = (pdfr[..., None] == iota_p[None, None, :]).astype(jnp.float32)
            llv = tk._split_mm(ohp, llt, "kap,p->ka")
            cand = scores[:, None] + w + llv
            flat = cand.reshape(-1)
            new_scores = jax.lax.dynamic_slice(flat, (0,), (KCAP,))
            fdst = rows[:, 2 * A:].astype(jnp.int32).reshape(-1)
            new_states = jax.lax.dynamic_slice(fdst, (0,), (KCAP,))
            return (new_states, new_scores), new_states

        s = step_floor if mode == "floor" else step

        def one(llu, packed):
            states0 = jnp.zeros((KCAP,), jnp.int32).at[0].set(g.start)
            scores0 = jnp.full((KCAP,), NEG, jnp.float32).at[0].set(0.0)
            if mode == "fixedll":
                llt0 = llu[0]
                (sf, scf), arcs = jax.lax.scan(
                    lambda c, x: s(c, llt0 + x, packed), (states0, scores0),
                    jnp.arange(llu.shape[0], dtype=jnp.float32))
            else:
                (sf, scf), arcs = jax.lax.scan(
                    lambda c, x: s(c, x, packed), (states0, scores0), llu)
            return jnp.max(scf) + jnp.sum(arcs % 7)

        def run(ll, packed):
            if mode == "exactpad":
                ll = jnp.pad(ll, ((0, 0), (0, 0), (0, 128 - ll.shape[-1])))
            return jnp.sum(jax.vmap(lambda u: one(u, packed))(ll))

        return jax.jit(run)


def main():
    import jax
    import jax.numpy as jnp

    from dsr_tpu.asr import lvcsr
    from dsr_tpu.asr.decoder import topk_decoder as tk

    task = lvcsr.build_task(lvcsr.LvcsrConfig())
    g = tk.build_token_graph(task.graph)
    S, A, P = g.num_states, g.a_max, task.num_pdfs
    print(f"graph: S={S} A_max={A} pdfs={P} kcap={KCAP} "
          f"candidates/frame={KCAP*A}")

    rng = np.random.default_rng(0)
    ll = jax.device_put(rng.standard_normal((U, T, P)).astype(np.float32))

    packed = jnp.concatenate(
        [g.weight, g.pdf.astype(jnp.float32), g.dst.astype(jnp.float32)],
        axis=1)

    def make_decode(mode, precap=1024):
        return build(mode, g, P, precap=precap)
        def step(carry, llt, packed):
            states, scores = carry
            rows = packed[states]                       # (kcap, 3A) row gather
            w = rows[:, :A]
            pdfr = rows[:, A:2 * A].astype(jnp.int32)
            cdst = rows[:, 2 * A:].astype(jnp.int32)
            if mode == "noll":
                llv = 0.0
            elif mode == "noll2":
                # data-dependent on llt but NO lookup: fixed slice broadcast
                llv = llt[:A][None, :]
            elif mode == "noll3":
                # lookup present but with CONSTANT indices (pdfr ignored)
                iota_a = jnp.arange(A, dtype=jnp.int32) % P
                ohp = (iota_a[None, :, None] == iota_p[None, None, :]
                       ).astype(jnp.float32)
                llv = tk._split_mm(ohp, llt, "kap,p->ka")
            elif mode == "noll4":
                # pdfr-shaped compare but against a constant table value
                llv = jnp.where(pdfr < P // 2, llt[0], llt[1])
            elif mode == "gatherll":
                llv = llt[pdfr]
            elif mode == "exactpad":
                # ll pre-padded to 128 lanes: the per-frame scan slice is
                # tile-aligned; one-hot built against the full 128 lanes
                i128 = jnp.arange(128, dtype=jnp.int32)
                ohp = (pdfr[..., None] == i128[None, None, :]).astype(jnp.float32)
                llv = tk._split_mm(ohp, llt, "kap,p->ka")
            elif mode == "llbf16":
                # one-hot born bf16 (never an f32 materialisation)
                ohp = (pdfr[..., None] == iota_p[None, None, :]).astype(jnp.bfloat16)
                th = llt.astype(jnp.bfloat16)
                tl = (llt - th.astype(jnp.float32)).astype(jnp.bfloat16)
                llv = (jnp.einsum("kap,p->ka", ohp, th,
                                  preferred_element_type=jnp.float32)
                       + jnp.einsum("kap,p->ka", ohp, tl,
                                    preferred_element_type=jnp.float32))
            elif mode == "llscan":
                # 120-step select-accumulate: no one-hot tensor at all
                def acc(p, a):
                    return a + jnp.where(pdfr == p, llt[p], 0.0)
                llv = jax.lax.fori_loop(0, P, acc,
                                        jnp.zeros(pdfr.shape, jnp.float32))
            elif mode == "llmm1":
                # P<=128: flat candidates x one-lane-row one-hot, ONE matmul
                # with hi|lo bf16 table columns (exact ids, ~2^-17 table)
                fp = pdfr.reshape(-1, 1).astype(jnp.int32)       # (K*A, 1)
                lanes = jnp.arange(128, dtype=jnp.int32)[None, :]
                oh = (fp == lanes).astype(jnp.bfloat16)          # (K*A, 128)
                llp = jnp.zeros((128,), llt.dtype).at[:P].set(llt)
                th = llp.astype(jnp.bfloat16)
                tl = (llp - th.astype(jnp.float32)).astype(jnp.bfloat16)
                tab = jnp.stack([th, tl], axis=1)                # (128, 2)
                lv = jnp.dot(oh, tab, preferred_element_type=jnp.float32)
                llv = (lv[:, 0] + lv[:, 1]).reshape(KCAP, A)
            else:
                ohp = (pdfr[..., None] == iota_p[None, None, :]).astype(jnp.float32)
                llv = tk._split_mm(ohp, llt, "kap,p->ka")
            cand = scores[:, None] + w + llv
            flat = cand.reshape(-1)
            fdst = cdst.reshape(-1)
            arc_ids = (states[:, None] * A
                       + jax.lax.broadcasted_iota(jnp.int32, (KCAP, A), 1)
                       ).reshape(-1)

            if mode == "nosort":
                mx = jnp.max(flat)
                val = jnp.where(flat > mx - BEAM, flat, NEG)
                new_scores, idx = jax.lax.top_k(val, KCAP)
                sd, sa = fdst, arc_ids
            elif mode == "precap":
                mx = jnp.max(flat)
                val = jnp.where(flat > mx - BEAM, flat, NEG)
                pv, pidx = jax.lax.top_k(val, precap)   # raw top-P, no dedup
                pd = fdst[pidx]
                pa = arc_ids[pidx]
                sd, sneg, sa = jax.lax.sort((pd, -pv, pa), num_keys=2)
                first = jnp.concatenate([jnp.ones((1,), bool), sd[1:] != sd[:-1]])
                val2 = jnp.where(first, -sneg, NEG)
                new_scores, idx = jax.lax.top_k(val2, KCAP)
                sd, sa = sd[idx], sa[idx]
                idx = None
            else:
                sd, sneg, sa = jax.lax.sort((fdst, -flat, arc_ids), num_keys=2)
                first = jnp.concatenate([jnp.ones((1,), bool), sd[1:] != sd[:-1]])
                val = jnp.where(first, -sneg, NEG)
                mx = jnp.max(val)
                val = jnp.where(val > mx - BEAM, val, NEG)
                if mode in ("notopk", "floor"):
                    new_scores, idx = val[:KCAP], None
                elif mode == "approx":
                    new_scores, idx = jax.lax.approx_max_k(
                        val, KCAP, recall_target=0.95)
                else:
                    new_scores, idx = jax.lax.top_k(val, KCAP)

            alive = new_scores > NEG / 2
            if idx is None:
                if mode in ("notopk", "floor"):
                    ns, sa_k = sd[:KCAP], sa[:KCAP]
                else:
                    ns, sa_k = sd, sa
            else:
                ns, sa_k = sd[idx], sa[idx]
            new_states = jnp.where(alive, ns, 0).astype(jnp.int32)
            return (new_states, new_scores), jnp.where(alive, sa_k, -1)

        def step_floor(carry, llt, packed):
            states, scores = carry
            rows = packed[states]
            w = rows[:, :A]
            pdfr = rows[:, A:2 * A].astype(jnp.int32)
            ohp = (pdfr[..., None] == iota_p[None, None, :]).astype(jnp.float32)
            llv = tk._split_mm(ohp, llt, "kap,p->ka")
            cand = scores[:, None] + w + llv
            flat = cand.reshape(-1)
            new_scores = jax.lax.dynamic_slice(flat, (0,), (KCAP,))
            fdst = rows[:, 2 * A:].astype(jnp.int32).reshape(-1)
            new_states = jax.lax.dynamic_slice(fdst, (0,), (KCAP,))
            return (new_states, new_scores), new_states

        s = step_floor if mode == "floor" else step

        def one(llu, packed):
            states0 = jnp.zeros((KCAP,), jnp.int32).at[0].set(g.start)
            scores0 = jnp.full((KCAP,), NEG, jnp.float32).at[0].set(0.0)
            if mode == "fixedll":
                llt0 = llu[0]
                (sf, scf), arcs = jax.lax.scan(
                    lambda c, x: s(c, llt0 + x, packed), (states0, scores0),
                    jnp.arange(llu.shape[0], dtype=jnp.float32))
            else:
                (sf, scf), arcs = jax.lax.scan(
                    lambda c, x: s(c, x, packed), (states0, scores0), llu)
            return jnp.max(scf) + jnp.sum(arcs % 7)

        def run(ll, packed):
            if mode == "exactpad":
                ll = jnp.pad(ll, ((0, 0), (0, 0), (0, 128 - ll.shape[-1])))
            return jnp.sum(jax.vmap(lambda u: one(u, packed))(ll))

        return jax.jit(run)

    def timed(fn, *args):
        float(fn(*args))                 # compile + warmup
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            float(fn(*args))
        return (time.perf_counter() - t0) / reps

    # dispatch floor
    @jax.jit
    def empty(z):
        return jax.lax.fori_loop(0, 1000, lambda i, a: a + z, 0.0)
    de = timed(empty, jnp.float32(1.0)) / 1000.0 * 1000  # ms total
    print(f"dispatch floor ~{de*1000:.1f} ms/call")

    results = {}
    plan = [("exact", {}), ("exactpad", {}), ("fixedll", {})]
    if os.environ.get("FULL"):
        plan += [("noll", {}), ("nosort", {}), ("notopk", {}),
                 ("floor", {}), ("approx", {}),
                 ("precap", {"precap": 512}),
                 ("precap", {"precap": 1024}),
                 ("precap", {"precap": 2048}),
                 ("gatherll", {})]
    for mode, kw in plan:
        name = mode + (str(kw.get("precap")) if kw else "")
        t = timed(make_decode(mode, **kw), ll, packed) - de
        per_frame = t / T * 1e6
        audio = U * T / 125.0
        results[name] = per_frame
        print(f"{name:12s} {per_frame:8.1f} us/frame(batch{U})   "
              f"{audio/t:8.1f} audio-sec/s")

    for k, v in results.items():
        print(f"  {k:12s} {v:8.1f} us/frame")


if __name__ == "__main__":
    main()
