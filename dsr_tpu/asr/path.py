"""Forced-alignment paths (reference `asr/path/` [K]): state-level Viterbi
alignments for training/adaptation, with phone/word segmentations."""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

import jax

from dsr_tpu.asr.am import gmm as jgmm
from dsr_tpu.asr.decoder import viterbi as jvit

NEG = -1e30


def _is_linear_chain(A: np.ndarray, init: np.ndarray, final: np.ndarray) -> bool:
    """True iff the graph is a strict left-to-right chain (self + advance
    only, start at 0, final at the last state) — the banded kernel's
    structure.  Host-side O(L²) check on the numpy graph."""
    L = A.shape[0]
    off = np.asarray(A, np.float64).copy()
    np.fill_diagonal(off, NEG)
    if L > 1:
        off[np.arange(L - 1), np.arange(1, L)] = NEG
    return (
        bool(np.all(off <= NEG / 2))
        and init[0] > NEG / 2 and bool(np.all(init[1:] <= NEG / 2))
        and final[L - 1] > NEG / 2 and bool(np.all(final[:-1] <= NEG / 2))
    )


@dataclass
class Alignment:
    states: np.ndarray        # (T,) global pdf/state ids
    score: float
    segments: list            # [(unit_id, start_frame, end_frame)]


def force_align(task, params: jgmm.GmmParams, feats: np.ndarray, words: list[str]) -> Alignment:
    """Viterbi forced alignment of one utterance against its transcript.

    `task` provides align_graph(words) → (ids, logA, init, final) as in
    smallvocab.SmallVocabTask / phone_task.PhoneTask.
    """
    ids, A, init, final = task.align_graph(words)
    ll = jgmm.loglik(params, jnp.asarray(feats, jnp.float32))
    ll_graph = ll[:, ids]
    if jax.default_backend() != "cpu" and _is_linear_chain(A, init, final):
        # HOT LOOP 4 in its alignment form: forced-alignment graphs are
        # left-to-right chains, so the O(L) banded Pallas kernel replaces
        # the O(L^2) dense recursion (see tools/bench_kernels.py timings)
        from dsr_tpu.ops.pallas import viterbi as pvit

        L = len(ids)
        self_lp = np.ascontiguousarray(np.diag(A)).astype(np.float32)
        adv_lp = np.concatenate(
            [[np.float32(-1e30)], np.diag(A, 1)]
        ).astype(np.float32)
        path, score = pvit.banded_viterbi(ll_graph, self_lp, adv_lp)
        score = score + init[0] + final[L - 1]   # kernel assumes 0-weight ends
    else:
        path, score = jvit.viterbi(
            ll_graph, jnp.asarray(A, jnp.float32), jnp.asarray(init, jnp.float32),
            jnp.asarray(final, jnp.float32),
        )
    gpath = np.asarray(ids)[np.asarray(path)]
    # segment boundaries: runs of equal graph POSITION (not state id)
    pos = np.asarray(path)
    segs = []
    start = 0
    for t in range(1, len(pos) + 1):
        if t == len(pos) or pos[t] != pos[t - 1]:
            segs.append((int(gpath[start]), start, t))
            start = t
    return Alignment(gpath, float(score), segs)
