"""Graph-sharded WFST decoding over the `model` mesh axis (config 4).

The composed HCLG's per-state arc tables are partitioned across chips by
state range; active tokens are replicated over the graph shards; each shard
expands only the tokens whose SOURCE states it owns and recombines its own
candidates by the same sort-based segmented max the single-chip top-K
decoder uses; the per-frame exchange is an `all_gather` of each shard's
top-Kcap (dst, score, arc, olabel) candidates over the ICI ring followed by
a replicated merge — "active-beam state exchanged via ICI collectives
inside a batched lax.scan decode loop" (BASELINE.json / SURVEY.md §2.3).
Utterances ride the `data` axis.

Scalability: NOTHING in the frame loop is O(S).  Per frame each shard does
O(Kcap·A_max log) local work plus an O(n_model·Kcap) exchange — the graph
can exceed a single chip's memory without the decode loop ever touching a
dense state board (the round-1 implementation scatter-maxed into an (S,)
board + pmax, reinstating the state-count ceiling; this rewrite removes
it).

Exactness: equal to the single-device top-K decode.  The global best
candidate for any destination state is generated on exactly one shard (the
owner of the winning arc's source state), where it outranks the candidates
it beats globally — so it survives that shard's local top-Kcap and the
merged top-Kcap equals the unsharded one.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from dsr_tpu.asr.decoder.topk_decoder import NEG, TokenGraph, _split_mm


def pad_token_graph_states(g: TokenGraph, shards: int) -> TokenGraph:
    """Pad S to a multiple of `shards` so state ranges split evenly."""
    S = g.num_states
    Sp = ((S + shards - 1) // shards) * shards
    pad = Sp - S
    if pad == 0:
        return g
    return TokenGraph(
        jnp.pad(g.pdf, ((0, pad), (0, 0))),
        jnp.pad(g.olabel, ((0, pad), (0, 0))),
        jnp.pad(g.weight, ((0, pad), (0, 0)), constant_values=NEG),
        jnp.pad(g.dst, ((0, pad), (0, 0))),
        g.start,
        jnp.pad(g.final_weight, (0, pad), constant_values=NEG),
        Sp,
        g.a_max,
    )


def simulate_sharded_kernel_decode(graph: TokenGraph, loglik, n_shards: int,
                                   kcap: int = 128, beam: float = 1e9):
    """Multi-shard SELECT-KERNEL execution harness (round-4 VERDICT weak
    #1): the sharded frame loop with the REAL Pallas kernel running each
    shard's local recombine — outside shard_map, so interpret-mode Pallas
    is tractable on CPU (inside shard_map it compiles pathologically; see
    make_sharded_decode).  Arithmetic mirrors `decode_shard` line for
    line: per-shard source-state ownership → local kernel top-K
    (`_sel.recombine_topk`; shards ride the kernel's batch axis via its
    custom_vmap rule, so every frame runs ONE kernel whose per-shard
    128-row blocks are the n_shards local recombines) → the replicated
    (dst, -score, arc) merge → beam prune → top-K.  Equal to the
    single-chip decode whenever no shard spills — the property the
    shard_map path asserts but could never execute with n_shards > 1 on
    the CPU suites (the physical multi-DEVICE execution stays chip-gated;
    this covers the kernel↔merge arithmetic at n_shards ≥ 2).

    loglik: (T, P) one utterance.  Returns (olabels (T,), score,
    spill_count)."""
    import numpy as np

    from dsr_tpu.ops.pallas import select as _sel

    g = pad_token_graph_states(graph, n_shards)
    S, A = g.num_states, g.a_max
    Ssh = S // n_shards
    offs = jnp.arange(n_shards, dtype=jnp.int32) * Ssh
    iota_a = jnp.arange(A, dtype=jnp.int32)

    @jax.jit
    def run(ll):
        T = ll.shape[0]
        states0 = jnp.zeros((kcap,), jnp.int32).at[0].set(g.start)
        scores0 = jnp.full((kcap,), NEG, jnp.float32).at[0].set(0.0)

        def step(carry, llt):
            states, scores = carry

            def shard_local(off):
                local = states - off
                mine = (local >= 0) & (local < Ssh)
                li = jnp.clip(local, 0, Ssh - 1) + off      # global rows
                w = jnp.where(mine[:, None], g.weight[li], NEG)
                cand = scores[:, None] + w + llt[g.pdf[li]]
                fdst = g.dst[li].reshape(-1)
                arcs = (states[:, None] * A + iota_a[None, :]).reshape(-1)
                return cand.reshape(-1), fdst, arcs

            cand, fdst, arcs = jax.vmap(shard_local)(offs)
            lv, ld, la, sp = jax.vmap(
                lambda c, f, a: _sel.recombine_topk(
                    c, f, a, jnp.float32(beam), kcap=kcap))(cand, fdst, arcs)
            gv, gd, ga = lv.reshape(-1), ld.reshape(-1), la.reshape(-1)
            # replicated merge — identical to decode_shard
            md, mneg, ma = jax.lax.sort((gd, -gv, ga), num_keys=3)
            firstm = jnp.concatenate([jnp.ones((1,), bool), md[1:] != md[:-1]])
            mval = jnp.where(firstm, -mneg, NEG)
            mx = jnp.max(mval)
            mval = jnp.where(mval > mx - beam, mval, NEG)
            new_scores, midx = jax.lax.top_k(mval, kcap)
            alive = new_scores > NEG / 2
            new_states = jnp.where(alive, md[midx], 0).astype(jnp.int32)
            bp_arc = jnp.where(alive, ma[midx], -1)
            return (new_states, new_scores), (new_states, bp_arc,
                                              jnp.any(sp))

        (sf, scf), (tok_states, tok_arcs, spills) = jax.lax.scan(
            step, (states0, scores0), ll)
        return sf, scf, tok_states, tok_arcs, jnp.sum(spills.astype(jnp.int32))

    sf, scf, tok_states, tok_arcs, spill_count = run(jnp.asarray(loglik))
    fin = np.asarray(g.final_weight)
    ola = np.asarray(g.olabel).reshape(-1)
    states, scores = np.asarray(sf), np.asarray(scf)
    tok_states, tok_arcs = np.asarray(tok_states), np.asarray(tok_arcs)
    T = tok_states.shape[0]
    total = scores + fin[states]
    if total.max() <= NEG / 2:
        total = scores
    slot = int(np.argmax(total))
    state = states[slot]
    best = float(total[slot])
    olabs = np.zeros(T, np.int32)
    for t in range(T - 1, -1, -1):
        k = int(np.argmax(tok_states[t] == state))
        arc = tok_arcs[t][k]
        if arc >= 0:
            olabs[t] = ola[arc]
            state = np.int32(arc // A)
    return olabs, best, int(spill_count)


def make_sharded_decode(mesh: Mesh, graph: TokenGraph, kcap: int = 256,
                        beam: float = 1e9, return_tokens: bool = False,
                        select_mode: str = "auto"):
    """Build a jitted sharded decode fn: (loglik (U, T, Pdf), lengths (U,))
    → (olabels (U, T), scores (U,), spill_frames (U,)) [+ token arrays if
    `return_tokens`].

    Arc tables are sharded over `model` by state range; loglik/lengths over
    `data`; the per-frame merge is an all_gather of per-shard top-K
    candidate sets (see module docstring).

    select_mode="auto" runs each shard's local recombine/top-K through the
    Pallas select kernel (ops/pallas/select.py) at supported shapes — the
    per-shard pool is exactly the kernel's shape, and olabels leave the
    frame loop entirely (resolved at traceback by owner lookup + pmax,
    which also drops one plane from the per-frame all_gather).  spill_frames
    counts frames whose local selection may differ from the exact sorts
    (0 certifies sharded == single just like the single-chip path);
    "xla" forces the round-2 sort path.
    """
    n_model = mesh.shape["model"]
    kcap = min(kcap, graph.num_states)
    g = pad_token_graph_states(graph, n_model)
    S, A = g.num_states, g.a_max
    S_shard = S // n_model
    start_v = int(g.start)
    from dsr_tpu.ops.pallas import select as _sel
    from dsr_tpu.ops.pallas import use_interpret
    # interpret-mode Pallas inside shard_map compiles pathologically
    # (>20 min for a 2-frame scan on the 8-device CPU sim — the kernel
    # jaxpr is re-evaluated per device under the shard_map tracer), so
    # the kernel path engages on the real chip only; CPU suites cover it
    # via tests/test_parallel.py's chip-gated strict test through
    # tools/run_pallas_on_tpu.py
    use_kernel = (select_mode != "xla" and not use_interpret()
                  and _sel.supported(kcap * A, kcap, 0))
    # the cross-shard merge is itself a recombine-top-K over n_model*kcap
    # candidates — run it through the kernel too (the XLA sort+top_k merge
    # dominates the sharded frame loop's 2.9x single-chip tax: 476 vs 162
    # us/frame, KERNELS.md round 5).  Small pools are NEG-padded up to the
    # kernel's 4*LANES minimum: NEG candidates never survive the alive
    # mask, and the batch axis stacks all utterances into one kernel.
    merge_pad = max(4 * 128 - n_model * kcap, 0)
    merge_kernel = (use_kernel
                    and _sel.supported(n_model * kcap + merge_pad, kcap, 0))
    if select_mode == "pallas" and not use_kernel:
        raise ValueError(
            f"select_mode='pallas' but the select kernel does not cover "
            f"this shape (candidates={kcap * A}, kcap={kcap}) or the "
            "backend is interpret-mode (sharded kernel decode needs the "
            "real chip)")

    # ids are exact in f32 below 2^24 (the 14.6M-arc config-4 graph has
    # 6.0M states — comfortably inside); larger graphs fall back to
    # separate planes
    packed_rows = S < (1 << 24)

    def decode_shard(pdf, ola, wgt, dst, fin, loglik, lengths):
        # pdf/wgt/dst: (S_shard, A) — or, when `packed_rows`, wgt is the
        # FUSED (S_shard, 3A) w|pdf|dst plane and pdf/dst are unused
        # placeholders: ONE row-gather instead of three, same trick as
        # topk_decoder._make_step (TPU gathers serialise — three separate
        # (kcap, A) gathers measured ~45 us/utt/frame of the sharded
        # loop's 2.9x single-chip tax).  ola: (S_shard, A); fin:
        # (S_shard,); loglik: (U_sh, T, P)
        shard = jax.lax.axis_index("model")
        offset = shard * S_shard

        def fin_of(states):
            """Final weight lookup across shards: owner supplies, pmax merges
            (non-final and non-owned both yield NEG)."""
            local = states - offset
            mine = (local >= 0) & (local < S_shard)
            f = jnp.where(mine, fin[jnp.clip(local, 0, S_shard - 1)], NEG)
            return jax.lax.pmax(f, "model")

        def olab_of(arc):
            """Output label of a GLOBAL arc id across shards: the owner of
            the arc's source state supplies it, pmax merges (labels are
            non-negative; -1 arcs and non-owners yield -1 → max 0)."""
            row = arc // A - offset
            mine = (arc >= 0) & (row >= 0) & (row < S_shard)
            o = jnp.where(
                mine,
                ola[jnp.clip(row, 0, S_shard - 1),
                    jnp.clip(arc % A, 0, A - 1)], -1)
            return jnp.maximum(jax.lax.pmax(o, "model"), 0)

        def one_utt(ll, length):
            T = ll.shape[0]
            states0 = jnp.zeros((kcap,), jnp.int32).at[0].set(jnp.int32(start_v))
            scores0 = jnp.full((kcap,), NEG, jnp.float32).at[0].set(0.0)
            # the carry varies over `data` (it depends on this shard's ll)
            # and is marked varying over `model` too: every shard computes
            # identical merged values (the all_gather makes the merge
            # replicated by construction) but the type system tracks the
            # gather's per-shard provenance; the final pmax re-marks outputs
            # replicated.
            states0 = jax.lax.pcast(states0, ("data", "model"), to="varying")
            scores0 = jax.lax.pcast(scores0, ("data", "model"), to="varying")

            def step(carry, inp):
                states, scores = carry
                t, llt = inp
                # ---- expand MY tokens only (source-state ownership) ------
                local = states - offset
                mine = (local >= 0) & (local < S_shard)
                li = jnp.clip(local, 0, S_shard - 1)
                if packed_rows:
                    rows = wgt[li]                   # ONE (kcap, 3A) gather
                    w = jnp.where(mine[:, None], rows[:, :A], NEG)
                    pdfr = rows[:, A:2 * A].astype(jnp.int32)
                    dstr = rows[:, 2 * A:].astype(jnp.int32)
                else:
                    w = jnp.where(mine[:, None], wgt[li], NEG)   # (kcap, A)
                    pdfr = pdf[li]
                    dstr = dst[li]
                P = llt.shape[-1]
                if P <= 2048:
                    # HOT LOOP 4 lookup on the MXU (a kcap·A gather from a
                    # tiny table measured 477 µs/frame on-chip; see
                    # topk_decoder._make_step)
                    ohp = (pdfr[..., None]
                           == jnp.arange(P, dtype=jnp.int32)).astype(jnp.float32)
                    llv = _split_mm(ohp, llt, "kap,p->ka")
                else:
                    llv = llt[pdfr]
                cand = scores[:, None] + w + llv
                flat = cand.reshape(-1)
                fdst = dstr.reshape(-1)
                arc_ids = (states[:, None] * A
                           + jax.lax.broadcasted_iota(jnp.int32, (kcap, A), 1)
                           ).reshape(-1)
                # ---- local recombine → my top-Kcap -----------------------
                # The kernel pre-prunes against the LOCAL frame max with
                # the same beam — safe: local max <= global max, so the
                # local threshold is never tighter than the merge's global
                # beam prune (and it keeps the spill certificate tight).
                if use_kernel:
                    loc_v, loc_d, loc_a, spill = _sel.recombine_topk(
                        flat, fdst, arc_ids, jnp.float32(beam), kcap=kcap)
                else:
                    sd, sneg, sa = jax.lax.sort(
                        (fdst, -flat, arc_ids), num_keys=3
                    )
                    first = jnp.concatenate([jnp.ones((1,), bool),
                                             sd[1:] != sd[:-1]])
                    val = jnp.where(first, -sneg, NEG)
                    loc_v, idx = jax.lax.top_k(val, kcap)
                    loc_d, loc_a = sd[idx], sa[idx]
                    spill = jnp.zeros((), bool)
                # ---- exchange: all_gather candidate sets over ICI --------
                # ONE all_gather of a stacked (3, kcap) plane instead of
                # three (one collective launch per frame instead of three
                # at n_model>1; neutral at n_model=1 where gathers compile
                # away); int planes ride as bitcast f32 so exact ids
                # survive (f32 itself only holds ints < 2^24 — a 14.6M-arc
                # graph's arc ids do not fit)
                stacked = jnp.stack([
                    loc_v,
                    jax.lax.bitcast_convert_type(loc_d, jnp.float32),
                    jax.lax.bitcast_convert_type(loc_a, jnp.float32)])
                gall = jax.lax.all_gather(stacked, "model", tiled=True,
                                          axis=1)
                gv = gall[0]
                gd = jax.lax.bitcast_convert_type(gall[1], jnp.int32)
                ga = jax.lax.bitcast_convert_type(gall[2], jnp.int32)
                # ---- replicated merge: recombine across shards -----------
                if merge_kernel:
                    if merge_pad:
                        gv = jnp.concatenate(
                            [gv, jnp.full((merge_pad,), NEG, gv.dtype)])
                        gd = jnp.concatenate(
                            [gd, jnp.zeros((merge_pad,), gd.dtype)])
                        ga = jnp.concatenate(
                            [ga, jnp.full((merge_pad,), -1, ga.dtype)])
                    new_scores, new_states, m_arc, mspill = \
                        _sel.recombine_topk(gv, gd, ga, jnp.float32(beam),
                                            kcap=kcap)
                    alive = new_scores > NEG / 2
                    new_states = jnp.where(alive, new_states, 0)
                else:
                    md, mneg, ma = jax.lax.sort((gd, -gv, ga), num_keys=3)
                    firstm = jnp.concatenate([jnp.ones((1,), bool),
                                              md[1:] != md[:-1]])
                    mval = jnp.where(firstm, -mneg, NEG)
                    mx = jnp.max(mval)
                    mval = jnp.where(mval > mx - beam, mval, NEG)  # beam prune
                    new_scores, midx = jax.lax.top_k(mval, kcap)
                    alive = new_scores > NEG / 2
                    new_states = jnp.where(alive, md[midx], 0).astype(jnp.int32)
                    m_arc = ma[midx]
                    mspill = jnp.zeros((), bool)
                keep = t < length
                states_o = jnp.where(keep, new_states, states)
                scores_o = jnp.where(keep, new_scores, scores)
                bp_arc = jnp.where(keep & alive, m_arc, -1)
                # any shard's local OR merge spill voids the certificate
                spill_any = jax.lax.pmax(
                    ((spill | mspill) & keep).astype(jnp.int32), "model") > 0
                return (states_o, scores_o), (states_o, bp_arc, scores_o,
                                              spill_any)

            ts = jnp.arange(T)
            (sf, scf), (tok_states, tok_arcs, tok_scores, spills) = jax.lax.scan(
                step, (states0, scores0), (ts, ll)
            )
            total = scf + fin_of(sf)
            # final fallback (matches topk_decoder): best token without the
            # final weight when no token reaches a final state
            total = jnp.where(jnp.max(total) > NEG / 2, total, scf)
            slot = jnp.argmax(total)
            best_state = sf[slot]
            best_score = total[slot]

            def back(state, inp):
                t, sts, arcs = inp
                k = jnp.argmax(sts == state)
                arc = arcs[k]
                valid = (t < length) & (arc >= 0)
                # flat arc id = src*A + slot → src = arc // A (no table)
                prev = jnp.where(valid, jnp.maximum(arc, 0) // A, state)
                olab = jnp.where(valid, olab_of(arc), 0)
                return prev, olab

            _, olabs = jax.lax.scan(
                back, best_state, (ts, tok_states, tok_arcs),
                reverse=True,
            )
            # identical on every model shard already (merge is replicated);
            # the pmax marks them replicated for out_specs inference
            rep = lambda x: jax.lax.pmax(x, "model")
            out = (rep(olabs), rep(best_score),
                   rep(jnp.sum(spills.astype(jnp.int32))))
            if return_tokens:
                out += (rep(tok_states), rep(tok_arcs), rep(tok_scores))
            return out

        return jax.vmap(one_utt)(loglik, lengths)

    nouts = 6 if return_tokens else 3
    # check_vma=False: interpret-mode Pallas (the CPU suites) evaluates
    # the select kernel's jaxpr under the vma checker, where every
    # kernel-internal constant is replicated-typed against varying inputs;
    # replication of the outputs is established by the explicit pmax/
    # all_gather structure instead (docstring)
    fn = shard_map(
        decode_shard,
        mesh=mesh,
        in_specs=(P("model"), P("model"), P("model"), P("model"), P("model"),
                  P("data"), P("data")),
        out_specs=tuple(P("data") for _ in range(nouts)),
        check_vma=False,
    )

    # The arc tables are placed SHARDED once at build time and passed as
    # jit ARGUMENTS: closing over them would bake them into the executable
    # as constants (jit constant capture) — a full unsharded copy that
    # defeats the O(S/n_model) residency claim at >1-chip graph sizes
    # (the 21M-arc config-4 graph's dense tables are 20 GB; round 5).
    from jax.sharding import NamedSharding
    rows = NamedSharding(mesh, P("model"))
    if packed_rows:
        fused = jnp.concatenate([g.weight, g.pdf.astype(jnp.float32),
                                 g.dst.astype(jnp.float32)], axis=1)
        planes = (jnp.zeros((S, 1), jnp.int32), g.olabel, fused,
                  jnp.zeros((S, 1), jnp.int32), g.final_weight)
    else:
        planes = (g.pdf, g.olabel, g.weight, g.dst, g.final_weight)
    g_dev = tuple(jax.device_put(x, rows) for x in planes)
    # the closure needs only the scalars (start_v/S/A); dropping the host
    # padded planes halves peak residency at >10 GB graph scale
    del g, graph, planes
    if packed_rows:
        del fused

    jfn = jax.jit(fn)

    def run(loglik, lengths):
        return jfn(*g_dev, jnp.asarray(loglik), jnp.asarray(lengths))

    return run
