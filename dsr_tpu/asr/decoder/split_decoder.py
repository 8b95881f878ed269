"""Degree-split top-K decoder — the candidate-pool structural lever.

The dense TokenGraph pads every state's arc row to A_max (47 on the
532k-state LVCSR HCLG) while the MEAN out-degree is 2.44: ~81% of the
12k-candidate frame pool is padding that the gather, the acoustic
lookup and the selection stage all still pay for.  This variant packs
arcs two-tier:

  - a (S, A0=8) MAIN table: every state's first 8 arcs (93.7% of all
    arcs; only ~2k word-end/LM states exceed 8 on the LVCSR graph);
  - an OVERFLOW table of 8-arc GROUP rows for the high-degree states;
    a token on such a state expands its extra groups through a fixed
    per-frame budget of EG group slots, assigned by prefix-sum over the
    active tokens (ragged → dense with one (EG, K) compare matrix; the
    searchsorted, the prefix gather and the per-slot counts are all
    mask einsums — no serialised gathers).

Candidates per frame: K·A0 + EG·A0 = 4096 at K=256, EG=256 — 2.9× fewer
than the dense table's 12032 — shrinking the packed-row gather, the
one-hot MXU acoustic lookup and the Pallas select kernel's presort
(whose cost is proportional to candidate rows) together.

MEASURED OUTCOME (round 3, on-chip, 532k-state bench config, A0=8):
NEUTRAL — 163-169 µs/frame vs the dense Pallas path's 160-164
(0.95-1.02×), words equal on real logliks, 0 budget overflows.  The
array-size savings were offset by the ~15 extra XLA ops of the ragged
expansion at that pool shrink (2.9×).

ROUND-5 CORRECTION: the neutrality was an A0=8 ARTIFACT, not a property
of the graph.  With the main width a build parameter, a0=2 shrinks the
monophone pool 5.2× (2304 vs 12032 candidates) against the same op
count: 108.8-118.3 µs/frame = 1.38-1.50× over the dense kernel path;
the certificate-clean production point (eg=896: ovf=0 AND spill=0 on
real in-domain loglik) runs 477/527 au-s/s at q=16/8 vs dense 393/425.
On the triphone graph a0=4 + eg=640 is the measured optimum (1.41× at
kcap=512).  KERNELS.md round-5 A0 sweep has the full tables; bench.py
adopts both.

Exactness: identical to the dense decoder whenever (a) the frame's
overflow demand fits the EG budget and (b) the select kernel does not
spill; both are certified per frame (`overflow`, `spill` outputs).
Budget overruns drop the HIGHEST-indexed tokens' extra groups first
(tokens are score-sorted from the previous frame's selection, so the
dropped extras belong to the weakest tokens).

Arc ids are uniform row*8+slot over [main rows | overflow rows], so the
traceback needs only a src_of_row table; lattice (nlat) decoding stays
on the dense path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from dsr_tpu.asr.decoder.topk_decoder import NEG, _split_mm
from dsr_tpu.asr.fsm.packed import PackedGraph

A0 = 8
_HI = jax.lax.Precision.HIGHEST


class SplitTokenGraph(NamedTuple):
    packed: jnp.ndarray      # (S, 3*A0+2) f32: w|pdf|dst|ov_base|ov_cnt
    ov_packed: jnp.ndarray   # (G, 3*A0) f32: w|pdf|dst per overflow group
    olabel: jnp.ndarray      # ((S+G)*A0,) int32 by uniform arc id
    src_of_row: jnp.ndarray  # (S+G,) int32 source state per table row
    start: jnp.ndarray
    final_weight: jnp.ndarray
    num_states: int
    num_groups: int
    a0: int = A0


def build_split_graph(g: PackedGraph, a0: int = A0) -> SplitTokenGraph:
    """Pack two-tier with a MAIN width of `a0` (default 8).  Smaller a0
    shrinks the kcap*a0 main pool on low-mean-degree graphs (triphone
    mean deg 3.9) at the price of more overflow-group traffic — the
    KERNELS.md round-5 A0 sweep (tools/exp_tri_decode.py) measures the
    trade."""
    S = g.num_states
    A = len(g.src)
    counts = np.bincount(g.src, minlength=S).astype(np.int64)
    order = np.argsort(g.src, kind="stable")
    run_start = np.cumsum(counts) - counts
    rows = g.src[order].astype(np.int64)
    slots = np.arange(A, dtype=np.int64) - run_start[rows]

    main = slots < a0
    w_m = np.full((S, a0), NEG, np.float32)
    p_m = np.zeros((S, a0), np.int32)
    d_m = np.zeros((S, a0), np.int32)
    o_m = np.zeros((S, a0), np.int32)
    w_m[rows[main], slots[main]] = -g.weight[order][main]
    p_m[rows[main], slots[main]] = g.pdf[order][main]
    d_m[rows[main], slots[main]] = g.dst[order][main]
    o_m[rows[main], slots[main]] = g.olabel[order][main]

    # overflow groups: ceil((deg - a0)/a0) per high-degree state, packed
    extra = np.maximum(counts - a0, 0)
    ngrp = -(-extra // a0)
    ov_base = np.zeros(S, np.int64)
    ov_base[1:] = np.cumsum(ngrp)[:-1]
    G = int(ngrp.sum())
    w_o = np.full((max(G, 1), a0), NEG, np.float32)
    p_o = np.zeros((max(G, 1), a0), np.int32)
    d_o = np.zeros((max(G, 1), a0), np.int32)
    o_o = np.zeros((max(G, 1), a0), np.int32)
    ext = ~main
    es = slots[ext] - a0
    erow = ov_base[rows[ext]] + es // a0
    eslot = es % a0
    w_o[erow, eslot] = -g.weight[order][ext]
    p_o[erow, eslot] = g.pdf[order][ext]
    d_o[erow, eslot] = g.dst[order][ext]
    o_o[erow, eslot] = g.olabel[order][ext]

    grp_state = np.repeat(np.arange(S, dtype=np.int64), ngrp)
    src_of_row = np.concatenate([np.arange(S, dtype=np.int64),
                                 grp_state]).astype(np.int32)
    olabel = np.concatenate([o_m, o_o[:G] if G else o_o[:0]],
                            axis=0).reshape(-1).astype(np.int32)
    packed = np.concatenate(
        [w_m, p_m.astype(np.float32), d_m.astype(np.float32),
         ov_base[:, None].astype(np.float32),
         ngrp[:, None].astype(np.float32)], axis=1)
    ov_packed = np.concatenate(
        [w_o, p_o.astype(np.float32), d_o.astype(np.float32)], axis=1)
    fin = np.where(np.isfinite(g.final_weight), -g.final_weight,
                   NEG).astype(np.float32)
    return SplitTokenGraph(
        jnp.asarray(packed), jnp.asarray(ov_packed),
        jnp.asarray(olabel), jnp.asarray(src_of_row),
        jnp.asarray(np.int32(g.start)), jnp.asarray(fin), S, G, a0)


@functools.partial(jax.jit, static_argnames=("num_states", "num_groups",
                                             "kcap", "eg", "select_q", "a0"))
def _decode_split_impl(loglik, length, packed, ov_packed, src_of_row,
                       final_w, start, *, num_states, num_groups, kcap,
                       beam, eg, select_q=16, a0=A0):
    from dsr_tpu.ops.pallas import select as _sel

    T, P = loglik.shape
    S = num_states
    iota_p = jnp.arange(P, dtype=jnp.int32)
    iota_e = jnp.arange(eg, dtype=jnp.int32)
    iota_k = jnp.arange(kcap, dtype=jnp.int32)

    def step(carry, inp):
        states, scores = carry
        t, ll = inp
        rows = packed[states]                       # (K, 3*a0+2) ONE gather
        w_m = rows[:, :a0]
        pdf_m = rows[:, a0:2 * a0].astype(jnp.int32)
        dst_m = rows[:, 2 * a0:3 * a0].astype(jnp.int32)
        ovb = rows[:, 3 * a0].astype(jnp.int32)
        ovc = rows[:, 3 * a0 + 1].astype(jnp.int32)

        # ---- ragged overflow groups → EG dense slots --------------------
        ovc_live = jnp.where(scores > NEG / 2, ovc, 0)
        pref = jnp.cumsum(ovc_live) - ovc_live              # exclusive
        demand = pref[-1] + ovc_live[-1]
        overflow = demand > eg
        # slot e belongs to token t_e = #{k: pref_k <= e} - 1
        cmp = (iota_e[:, None] >= pref[None, :]).astype(jnp.float32)
        t_e = jnp.sum(cmp, axis=1).astype(jnp.int32) - 1
        oh_t = (t_e[:, None] == iota_k[None, :]).astype(jnp.float32)
        # ONE (EG, K) @ (K, 4) pick for all per-token fields (the frame
        # loop is op-overhead-bound — see module docstring's measurement).
        # HIGHEST precision: the bf16 hi/lo split's ~2^-16 rel error on
        # the picked SCORES (|score| ~ 1e5 late in an utterance) made
        # split != dense by ~0.1 when winning arcs ride overflow (seen
        # at a0=2); this matmul is tiny, so exactness is free.
        tab = jnp.stack([pref.astype(jnp.float32),
                         ovc_live.astype(jnp.float32),
                         ovb.astype(jnp.float32), scores], axis=1)
        picked = jnp.einsum("ek,kc->ec", oh_t, tab, precision=_HI)
        pref_e = picked[:, 0].astype(jnp.int32)
        ovc_e = picked[:, 1].astype(jnp.int32)
        ovb_e = picked[:, 2].astype(jnp.int32)
        sc_e = picked[:, 3]
        j_e = iota_e - pref_e
        valid_e = (t_e >= 0) & (j_e < ovc_e)
        grow = jnp.clip(ovb_e + j_e, 0, max(num_groups - 1, 0))
        orows = ov_packed[grow]                      # (EG, 3*a0) gather
        w_e = jnp.where(valid_e[:, None], orows[:, :a0], NEG)
        pdf_e = orows[:, a0:2 * a0].astype(jnp.int32)
        dst_e = orows[:, 2 * a0:].astype(jnp.int32)

        # ---- unified (K+EG, a0) candidate block -------------------------
        w_all = jnp.concatenate([w_m, w_e], axis=0)
        pdf_all = jnp.concatenate([pdf_m, pdf_e], axis=0)
        dst_all = jnp.concatenate([dst_m, dst_e], axis=0)
        base = jnp.concatenate([scores, sc_e], axis=0)
        row_id = jnp.concatenate([states, S + grow], axis=0)
        ohp = (pdf_all[..., None] == iota_p[None, None, :]).astype(jnp.float32)
        llv = _split_mm(ohp, ll, "kap,p->ka")
        cand = base[:, None] + w_all + llv
        arc_ids = (row_id[:, None] * a0 + jnp.arange(a0)[None, :])
        new_scores, new_dst, new_arc, spill = _sel.recombine_topk(
            cand.reshape(-1), dst_all.reshape(-1), arc_ids.reshape(-1),
            jnp.float32(beam), kcap=kcap, q=select_q)
        alive = new_scores > NEG / 2
        new_states = jnp.where(alive, new_dst, 0)
        keep = t < length
        states_o = jnp.where(keep, new_states, states)
        scores_o = jnp.where(keep, new_scores, scores)
        bp = jnp.where(keep & alive, new_arc, -1)
        return (states_o, scores_o), (states_o, bp, scores_o,
                                      spill & keep, overflow & keep)

    states0 = jnp.zeros((kcap,), jnp.int32).at[0].set(start)
    scores0 = jnp.full((kcap,), NEG, jnp.float32).at[0].set(0.0)
    (sf, scf), (tok_states, tok_arcs, tok_scores, spills, overflows) = \
        jax.lax.scan(step, (states0, scores0),
                     (jnp.arange(T), loglik))
    total = scf + final_w[sf]
    total = jnp.where(jnp.max(total) > NEG / 2, total, scf)
    slot = jnp.argmax(total)
    best_state = sf[slot]
    best_score = total[slot]
    olab_tab = None

    def back(state, inp):
        t, sts, arcs = inp
        k = jnp.argmax(sts == state)
        arc = arcs[k]
        valid = (t < length) & (arc >= 0)
        prev = jnp.where(valid, src_of_row[jnp.maximum(arc, 0) // a0], state)
        return prev, (jnp.maximum(arc, 0), valid)

    _, (arcs_bt, valid_bt) = jax.lax.scan(
        back, best_state, (jnp.arange(T), tok_states, tok_arcs),
        reverse=True)
    return (arcs_bt, valid_bt, best_score, jnp.sum(spills),
            jnp.sum(overflows))


def decode_split(graph: SplitTokenGraph, loglik, kcap: int = 256,
                 beam: float = 1e9, length=None, eg: int = 256,
                 select_q: int = 16):
    """Degree-split decode of one utterance: loglik (T, P) →
    (olabels (T,), score, spill_frames, overflow_frames).  Batch with
    jax.vmap (the select kernel stacks the batch into one kernel)."""
    T = loglik.shape[0]
    kcap = min(kcap, graph.num_states)
    if kcap % 128 or kcap < 128:
        raise ValueError(
            "decode_split requires kcap a multiple of 128 (the Pallas "
            f"select kernel is its only selection path); got {kcap} — "
            "use the dense topk_decoder for small graphs")
    ln = jnp.asarray(T if length is None else length, jnp.int32)
    arcs, valid, score, spills, ovf = _decode_split_impl(
        loglik, ln, graph.packed, graph.ov_packed, graph.src_of_row,
        graph.final_weight, graph.start, num_states=graph.num_states,
        num_groups=graph.num_groups, kcap=kcap, beam=beam, eg=eg,
        select_q=select_q, a0=graph.a0)
    olabs = jnp.where(valid, graph.olabel[arcs], 0)
    return olabs, score, spills, ovf


def decode_batch_split(graph: SplitTokenGraph, loglik, lengths,
                       kcap: int = 256, beam: float = 1e9, eg: int = 256,
                       select_q: int = 16):
    """Batched degree-split decode: loglik (U, T, P), lengths (U,) →
    (olabels (U, T), scores (U,), spill_frames (U,), overflow_frames
    (U,))."""
    f = jax.vmap(lambda ll, ln: decode_split(
        graph, ll, kcap=kcap, beam=beam, length=ln, eg=eg,
        select_q=select_q))
    return f(loglik, jnp.asarray(lengths, jnp.int32))
