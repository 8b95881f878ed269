"""Batched top-K token-passing WFST decoder (the LVCSR path).

Reference behaviour: token lists + beam & histogram pruning per frame
(SURVEY.md §3.3 HOT LOOP 3).  TPU-native realisation with fixed shapes:

  - arcs are padded per-state to A_max (CSR → dense (S, A_max) tables)
  - per frame: gather the active tokens' arc rows and score all Kcap·A_max
    candidates at once; token RECOMBINATION (max per destination state) is
    a lexicographic sort by (dst, -score) — the first occurrence of each
    dst in sort order is its best candidate.  TPU scatters serialise
    (~50 µs/frame for a `.at[dst].max` board on v5e), so the sort-based
    segmented max replaces the dense score board entirely; nothing in the
    frame loop is O(S) any more, which also removes the state-count limit
    on graph size.  Beam prune against the frame max, then `top_k`
    (histogram-prune analogue) selects the next Kcap tokens.
  - backpointers: (T, Kcap) winning (state, arc) pairs; traceback matches
    states against each frame's token list on device

Exact when Kcap ≥ #reachable states (tested against the dense decoder);
`parallel/decoder.py` shards the arc tables over the `model` mesh axis and
combines score boards with pmax — the graph-sharded pod-slice decode of
BASELINE.json config 4.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dsr_tpu.asr.fsm.packed import PackedGraph

NEG = -1e30


class TokenGraph(NamedTuple):
    pdf: jnp.ndarray      # (S, A_max) int32
    olabel: jnp.ndarray   # (S, A_max) int32
    weight: jnp.ndarray   # (S, A_max) f32 log-prob (NEG where invalid)
    dst: jnp.ndarray      # (S, A_max) int32
    start: jnp.ndarray
    final_weight: jnp.ndarray  # (S,) f32 log-prob (NEG non-final)
    num_states: int
    a_max: int


def build_token_graph(g: PackedGraph) -> TokenGraph:
    S = g.num_states
    A = len(g.src)
    counts = np.bincount(g.src, minlength=S).astype(np.int64)
    A_max = max(1, int(counts.max()))
    # vectorised per-state slot assignment: stable-sort arcs by src, then
    # slot = rank within the run (LVCSR graphs have 10^5-10^6 arcs)
    order = np.argsort(g.src, kind="stable")
    run_start = np.cumsum(counts) - counts                 # (S,)
    rows = g.src[order].astype(np.int64)
    slots = np.arange(A, dtype=np.int64) - run_start[rows]
    pdf = np.zeros((S, A_max), np.int32)
    ola = np.zeros((S, A_max), np.int32)
    wgt = np.full((S, A_max), NEG, np.float32)
    dst = np.zeros((S, A_max), np.int32)
    pdf[rows, slots] = g.pdf[order]
    ola[rows, slots] = g.olabel[order]
    wgt[rows, slots] = -g.weight[order]
    dst[rows, slots] = g.dst[order]
    fin = np.where(np.isfinite(g.final_weight), -g.final_weight, NEG).astype(np.float32)
    return TokenGraph(
        jnp.asarray(pdf), jnp.asarray(ola), jnp.asarray(wgt), jnp.asarray(dst),
        jnp.asarray(np.int32(g.start)), jnp.asarray(fin),
        S, A_max,
    )


_HI = jax.lax.Precision.HIGHEST


def _split_mm(oh, table, eq):
    """One-hot lookup as TWO bf16 MXU passes: the 0/1 one-hot is exact in
    bf16 and the f32 table splits into hi+lo bf16 halves — ~2^-17 relative
    table accuracy (two 8-bit-mantissa terms ≈ 17 of f32's 24 bits; a
    3-term split would be exact but costs 50% more passes).  A single
    default-precision pass rounds the table to bf16 (~2^-8, corrupting
    scores); HIGHEST costs 6 passes.  2^-17 puts ~1e-3 absolute noise on
    |loglik| ~ 1e2 values — two orders below the beam/LM scale, and the
    golden-parity decode gates (score tolerance 1e-2, identical word
    output) pass with it.

    The optimization_barrier on `th` is LOAD-BEARING (round 4): XLA's
    excess-precision simplification folds f32(bf16(t)) -> t, which turns
    the residual `tl` into bf16(t - t) = 0 and silently degrades the
    whole lookup to single-bf16 (measured on-chip: error 2^-9·|table|,
    e.g. overflow-group ids off by up to 128 — the split decoder decoded
    garbage at triphone scale).  Barriers after `tl` or between the two
    matmuls do NOT help; the fold happens in tl's producer chain.
    tests/test_pallas.py::test_split_mm_exact_for_ids guards this
    on-chip."""
    th = jax.lax.optimization_barrier(table.astype(jnp.bfloat16))
    tl = (table - th.astype(jnp.float32)).astype(jnp.bfloat16)
    ohb = oh.astype(jnp.bfloat16)
    return (jnp.einsum(eq, ohb, th, preferred_element_type=jnp.float32)
            + jnp.einsum(eq, ohb, tl, preferred_element_type=jnp.float32))


def _make_step(pdf, olabel, weight, dst, *, num_states, a_max, kcap, beam,
               nlat, num_pdfs, approx_topk=False, select_mode="auto",
               select_q=16):
    """Build the per-frame token-expansion step shared by the whole-
    utterance scan (`_decode_impl`) and the streaming chunk scan
    (`_decode_chunk_impl`).

    select_mode: "auto" dispatches the recombine/beam/top-K stage to the
    Pallas kernel (ops/pallas/select.py) at supported shapes — it replaces
    the two full candidate sorts and is ~2.7x faster on-chip (KERNELS.md);
    "xla" forces the sort path; "pallas" REQUIRES the kernel and raises at
    unsupported shapes (so a benchmark labelled pallas can never silently
    measure the sort path — review round 4).
    Every step emits a per-frame `spill` flag LAST: the kernel path's
    value-based exactness certificate (its sum counts frames that may
    diverge from the sort path); the XLA path emits constant False."""
    S = num_states
    from dsr_tpu.ops.pallas import select as _sel
    sup = _sel.supported(kcap * a_max, kcap, nlat, q=select_q)
    if select_mode == "pallas" and (approx_topk or not sup):
        raise ValueError(
            f"select_mode='pallas' but the select kernel does not cover "
            f"this shape (candidates={kcap * a_max}, kcap={kcap}, "
            f"nlat={nlat}, approx_topk={approx_topk}); use 'auto' for "
            "silent fallback to the XLA sorts")
    use_pallas = select_mode != "xla" and not approx_topk and sup
    # Cross-lane gathers serialise on the TPU; for small/medium graphs the
    # token-row lookups are cheaper as one-hot matmuls on the MXU.  Integer
    # id tables go through HIGHEST-precision matmuls (ids above 256 are NOT
    # representable in bf16); float tables use the 2-pass split (_split_mm).
    use_onehot = S <= 2048 and num_pdfs <= 1024
    # HOT LOOP 4 (acoustic lookup per candidate arc): ll[pdfr] is a
    # kcap·a_max-element gather from a tiny table — measured 477 µs/frame
    # on-chip for the 340k-state LVCSR graph (62% of decode time); the
    # one-hot MXU lookup is ~6x cheaper.  Gather only for huge pdf sets.
    use_onehot_ll = num_pdfs <= 2048
    if use_onehot:
        iota_s = jnp.arange(S, dtype=jnp.int32)
        wgt_f = weight
        pdf_f = pdf.astype(jnp.float32)
        dst_f = dst.astype(jnp.float32)
    else:
        # ONE row-gather instead of three: weight/pdf/dst pack into a
        # single f32 table (ids are exact in f32 below 2^24); TPU gathers
        # pay per ROW, so 3 tables cost ~2x one wide table (measured
        # 101 vs 52 µs/frame at kcap=256).
        packed = jnp.concatenate(
            [weight, pdf.astype(jnp.float32), dst.astype(jnp.float32)], axis=1
        )
    if use_onehot_ll:
        iota_p = jnp.arange(num_pdfs, dtype=jnp.int32)

    def step(carry, inp):
        states, scores = carry
        t, length, ll = inp
        if use_onehot:
            oh = (states[:, None] == iota_s[None, :]).astype(jnp.float32)
            w = _split_mm(oh, wgt_f, "ks,sa->ka")            # (kcap, a_max)
            pdfr = jnp.einsum("ks,sa->ka", oh, pdf_f,
                              precision=_HI).astype(jnp.int32)
            cdst = jnp.einsum("ks,sa->ka", oh, dst_f,
                              precision=_HI).astype(jnp.int32)
        else:
            rows = packed[states]                            # (kcap, 3·a_max)
            w = rows[:, :a_max]
            pdfr = rows[:, a_max:2 * a_max].astype(jnp.int32)
            cdst = rows[:, 2 * a_max:].astype(jnp.int32)
        if use_onehot_ll:
            ohp = (pdfr[..., None] == iota_p[None, None, :]).astype(jnp.float32)
            llv = _split_mm(ohp, ll, "kap,p->ka")
        else:
            llv = ll[pdfr]
        cand = scores[:, None] + w + llv
        flat = cand.reshape(-1)
        fdst = cdst.reshape(-1)
        # GLOBAL arc id per candidate (arc = state*a_max + slot)
        arc_ids = (states[:, None] * a_max
                   + jax.lax.broadcasted_iota(jnp.int32, (kcap, a_max), 1)).reshape(-1)
        if use_pallas:
            sscores, sdst, sarc, spill = _sel.recombine_topk(
                flat, fdst, arc_ids, jnp.float32(beam), kcap=kcap,
                q=select_q, nlat=nlat)
            if nlat:
                # lattice mode: (kcap, nlat) planes, column 0 = winner
                new_scores, new_dst, new_arc = (
                    sscores[:, 0], sdst[:, 0], sarc[:, 0])
            else:
                new_scores, new_dst, new_arc = sscores, sdst, sarc
            alive = new_scores > NEG / 2
            new_states = jnp.where(alive, new_dst, 0)
            keep = t < length
            states_out = jnp.where(keep, new_states, states)
            scores_out = jnp.where(keep, new_scores, scores)
            bp_arc = jnp.where(keep & alive, new_arc, -1)
            out = (states_out, bp_arc, scores_out)
            if nlat:
                out = out + (jnp.where(keep, sarc, -1),
                             jnp.where(keep, sscores, NEG))
            return (states_out, scores_out), out + (spill & keep,)
        # token recombination WITHOUT a scatter: lexicographic sort by
        # (dst, -score, arc): the first candidate of each dst run is its
        # max.  The arc id is a SORT KEY (num_keys=3), not a stable
        # payload, so exact-score ties resolve to the smallest arc id —
        # the same rule the Pallas select kernel uses, which is what
        # makes its spill certificate sound (review round 3)
        sd, sneg, sa = jax.lax.sort((fdst, -flat, arc_ids), num_keys=3)
        first = jnp.concatenate([jnp.ones((1,), bool), sd[1:] != sd[:-1]])
        val = jnp.where(first, -sneg, NEG)
        # beam prune + top-K (histogram prune analogue)
        mx = jnp.max(val)
        val = jnp.where(val > mx - beam, val, NEG)
        if approx_topk:
            # opt-in histogram-prune approximation: ~0.95 recall of the
            # exact top-K, 64 vs 96 µs/frame on-chip — another prune knob
            # beside the beam (keep exact for sharded==single parity)
            new_scores, idx = jax.lax.approx_max_k(val, kcap, recall_target=0.95)
        else:
            new_scores, idx = jax.lax.top_k(val, kcap)
        alive = new_scores > NEG / 2
        new_states = jnp.where(alive, sd[idx], 0).astype(jnp.int32)
        keep = t < length
        states_out = jnp.where(keep, new_states, states)
        scores_out = jnp.where(keep, new_scores, scores)
        bp_arc = jnp.where(keep & alive, sa[idx], -1)
        out = (states_out, bp_arc, scores_out)
        spill = jnp.zeros((), bool)    # the sort path is the reference
        if nlat:
            # LATTICE arcs: the sorted candidates are grouped by dst, best
            # first, and idx[k] is the START of slot k's run — so its top-N
            # incoming arcs are positions idx[k]..idx[k]+N-1, valid while
            # still inside the run (same dst) and the array.
            ncand = fdst.shape[0]
            pos = idx[:, None] + jnp.arange(nlat)[None, :]      # (kcap, N)
            posc = jnp.minimum(pos, ncand - 1)
            v = -sneg[posc]
            ok = (
                (sd[posc] == sd[idx][:, None]) & (pos < ncand)
                & alive[:, None] & keep & (v > mx - beam)
            )
            alt_arcs = jnp.where(ok, sa[posc], -1)
            alt_scores = jnp.where(ok, v, NEG)
            out = out + (alt_arcs, alt_scores)
        return (states_out, scores_out), out + (spill,)

    return step


def stream_start(graph: TokenGraph, kcap: int = 256):
    """Initial streaming carry: the start-state token."""
    kcap = min(kcap, graph.num_states)
    states0 = jnp.zeros((kcap,), jnp.int32).at[0].set(graph.start)
    scores0 = jnp.full((kcap,), NEG, jnp.float32).at[0].set(0.0)
    return states0, scores0


@functools.partial(jax.jit, static_argnames=("num_states", "a_max", "kcap", "nlat",
                                              "select_mode"))
def _decode_chunk_impl(loglik, length, states0, scores0, pdf, olabel, weight,
                       dst, *, num_states, a_max, kcap, beam, nlat=0,
                       select_mode="auto"):
    T = loglik.shape[0]
    step = _make_step(pdf, olabel, weight, dst, num_states=num_states,
                      a_max=a_max, kcap=kcap, beam=beam, nlat=nlat,
                      num_pdfs=loglik.shape[-1], select_mode=select_mode)
    ts = jnp.arange(T, dtype=jnp.int32)      # frames ≥ length are padding:
    lens = jnp.full((T,), length, jnp.int32) # carry passes through, arc=-1
    return jax.lax.scan(step, (states0, scores0), (ts, lens, loglik))


# Streaming chunk lengths are bucketed to these values: the axon runtime
# remote-compiles EVERY new shape (10-90 s), and real frontends emit ragged
# chunk lengths — without bucketing a streaming session thrashes the
# compile cache (one compile per distinct length).  Padded frames are
# masked by the t<length machinery, so results are bit-identical.
CHUNK_BUCKETS = (8, 16, 32, 64, 128, 256, 512, 1024)


def _bucket_len(T: int) -> int:
    for b in CHUNK_BUCKETS:
        if T <= b:
            return b
    # beyond the largest bucket: round up to a multiple of it
    top = CHUNK_BUCKETS[-1]
    return ((T + top - 1) // top) * top


def decode_chunk(graph: TokenGraph, loglik: jnp.ndarray, carry,
                 kcap: int = 256, beam: float = 1e9, nlat: int = 0,
                 select_mode: str = "auto", return_spill: bool = False):
    """Streaming decode of one chunk (SURVEY.md §5 long-context: chunked
    scan with carried decoder state).

    carry = (states (kcap,), scores (kcap,)) from `stream_start` or the
    previous chunk.  Returns (new_carry, (tok_states, tok_arcs, tok_scores
    [, alt_arcs, alt_scores][, spill])) — accumulate the token arrays and
    run `traceback` at utterance end; the result is IDENTICAL to the
    whole-utterance decode (the scan carry is the decoder's only state).

    select_mode plumbs through to the recombine/top-K stage exactly as in
    `decode_with_tokens` ("xla" forces the exact sort path; "pallas"
    raises at unsupported shapes); return_spill=True appends the per-frame
    spill flags (T,) — all-False certifies the chunk is exact vs the sort
    path (a spilled frame previously diverged silently with no way to
    detect or avoid it — review round 4).

    Chunks are padded internally to `CHUNK_BUCKETS` lengths (compile-cache
    hygiene on the axon runtime) and the outputs sliced back — callers see
    exactly T rows.
    """
    kcap = min(kcap, graph.num_states)
    T = loglik.shape[0]
    B = _bucket_len(T)
    if B != T:
        loglik = jnp.pad(loglik, ((0, B - T), (0, 0)))
    new_carry, outs = _decode_chunk_impl(
        loglik, jnp.asarray(T, jnp.int32), carry[0], carry[1], graph.pdf,
        graph.olabel, graph.weight, graph.dst, num_states=graph.num_states,
        a_max=graph.a_max, kcap=kcap, beam=beam,
        nlat=min(nlat, graph.a_max * kcap), select_mode=select_mode,
    )
    if not return_spill:
        outs = outs[:-1]         # spill flags are always emitted last
    if B != T:                   # callers accumulate (states, arcs, scores)
        outs = tuple(o[:T] for o in outs)
    return new_carry, outs


@functools.partial(jax.jit, static_argnames=("a_max",))
def _traceback_impl(tok_states, tok_arcs, states_f, scores_f, final_w, olabel,
                    *, a_max):
    T = tok_states.shape[0]
    total = scores_f + final_w[states_f]
    total = jnp.where(jnp.max(total) > NEG / 2, total, scores_f)
    best_slot = jnp.argmax(total)
    best_state = states_f[best_slot]
    best_score = total[best_slot]

    def back(state, inp):
        sts, arcs = inp
        slot = jnp.argmax(sts == state)
        arc = arcs[slot]
        valid = arc >= 0
        prev = jnp.where(valid, jnp.maximum(arc, 0) // a_max, state)
        olab = jnp.where(valid, olabel.reshape(-1)[jnp.maximum(arc, 0)], 0)
        return prev, olab

    _, olabs = jax.lax.scan(back, best_state, (tok_states, tok_arcs),
                            reverse=True)
    return olabs, best_score


def traceback(graph: TokenGraph, tok_states, tok_arcs, carry):
    """Utterance-final traceback over accumulated (possibly concatenated)
    streaming token arrays → (olabels (T,), score)."""
    states_f, scores_f = carry
    return _traceback_impl(tok_states, tok_arcs, states_f, scores_f,
                           graph.final_weight, graph.olabel, a_max=graph.a_max)


@functools.partial(jax.jit, static_argnames=("num_states", "a_max", "kcap", "nlat",
                                              "approx_topk", "select_mode",
                                              "select_q"))
def _decode_impl(loglik, length, pdf, olabel, weight, dst, start, final_w,
                 *, num_states, a_max, kcap, beam, nlat=0, approx_topk=False,
                 select_mode="auto", select_q=16):
    T = loglik.shape[0]
    states0 = jnp.zeros((kcap,), jnp.int32).at[0].set(start)
    scores0 = jnp.full((kcap,), NEG, jnp.float32).at[0].set(0.0)
    step = _make_step(pdf, olabel, weight, dst, num_states=num_states,
                      a_max=a_max, kcap=kcap, beam=beam, nlat=nlat,
                      num_pdfs=loglik.shape[-1], approx_topk=approx_topk,
                      select_mode=select_mode, select_q=select_q)
    ts = jnp.arange(T)
    lens = jnp.full((T,), length)
    (states_f, scores_f), outs = jax.lax.scan(
        step, (states0, scores0), (ts, lens, loglik)
    )
    tok_states, tok_arcs, tok_scores = outs[:3]
    total = scores_f + final_w[states_f]
    # final fallback: if no surviving token reaches a final state (e.g. the
    # utterance was cut mid-word), take the best token without the final
    # weight — the reference decoders' GetBestPath behaviour.
    total = jnp.where(jnp.max(total) > NEG / 2, total, scores_f)
    best_slot = jnp.argmax(total)
    best_state = states_f[best_slot]
    best_score = total[best_slot]

    def back(state, inp):
        t, sts, arcs = inp
        slot = jnp.argmax(sts == state)
        arc = arcs[slot]
        valid = (t < length) & (arc >= 0)
        # flat arc id = state*a_max + slot, so src state = arc // a_max
        prev = jnp.where(valid, jnp.maximum(arc, 0) // a_max, state)
        olab = jnp.where(
            valid,
            olabel.reshape(-1)[jnp.maximum(arc, 0)],
            0,
        )
        return prev, olab

    _, olabs = jax.lax.scan(back, best_state, (ts, tok_states, tok_arcs), reverse=True)
    return (olabs, best_score, tok_states, tok_arcs, tok_scores) + outs[3:]


def decode(graph: TokenGraph, loglik: jnp.ndarray, kcap: int = 256,
           beam: float = 1e9, length=None):
    """loglik: (T, P) → (olabels (T,), score ()).  0-olabels are epsilon."""
    out = decode_with_tokens(graph, loglik, kcap, beam, length)
    return out[0], out[1]


def decode_with_tokens(graph: TokenGraph, loglik: jnp.ndarray, kcap: int = 256,
                       beam: float = 1e9, length=None, nlat: int = 0,
                       select_mode: str = "auto", return_spill: bool = False):
    """Full decode returning the token lattice arrays:
    (olabels, score, tok_states (T,K), tok_arcs (T,K), tok_scores (T,K))
    [+ alt_arcs (T,K,nlat), alt_scores (T,K,nlat) when nlat > 0: the top-N
    incoming arcs per surviving token with their path scores — the TRUE
    lattice links for sum-posterior forward-backward and oracle search
    (reference asr/lattice [K])].

    return_spill=True appends the per-frame spill flags (T,) in a FIXED
    last position regardless of nlat — all-False certifies the decode is
    exact vs the sort path (ops/pallas/select.py docstring; the XLA path
    emits constant False)."""
    kcap = min(kcap, graph.num_states)
    length = jnp.asarray(loglik.shape[0] if length is None else length,
                         jnp.int32)
    out = _decode_impl(
        loglik, length, graph.pdf, graph.olabel, graph.weight, graph.dst,
        graph.start, graph.final_weight,
        num_states=graph.num_states, a_max=graph.a_max, kcap=kcap, beam=beam,
        nlat=min(nlat, graph.a_max * kcap), select_mode=select_mode,
    )
    if not return_spill:
        out = out[:-1]           # spill flags are always emitted last
    return out


def decode_batch(graph: TokenGraph, loglik: jnp.ndarray, lengths, kcap: int = 256,
                 beam: float = 1e9, approx_topk: bool = False,
                 select_mode: str = "auto", select_q: int = 16,
                 return_spill: bool = False):
    kcap = min(kcap, graph.num_states)
    f = jax.vmap(
        lambda ll, ln: _decode_impl(
            ll, ln, graph.pdf, graph.olabel, graph.weight, graph.dst,
            graph.start, graph.final_weight,
            num_states=graph.num_states, a_max=graph.a_max, kcap=kcap, beam=beam,
            approx_topk=approx_topk, select_mode=select_mode,
            select_q=select_q,
        )
    )
    out = f(loglik, jnp.asarray(lengths, jnp.int32))
    if return_spill:
        return out[0], out[1], out[-1]    # spill flags are always last
    return out[0], out[1]
