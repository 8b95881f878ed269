"""Pallas banded-Viterbi kernel — the beam-search inner loop for linear
(left-to-right) graphs (north_star "beam-search inner loops as Pallas
kernels"; HOT LOOP 3 of SURVEY.md §3.3 in its forced-alignment form).

Left-to-right HMMs have a banded transition structure (self + advance), so
the per-frame Viterbi update is gather-free:

    delta'[s] = ll[t, s] + max(delta[s] + w_self[s], delta[s-1] + w_adv[s])

The whole utterance runs in ONE kernel: grid over frames, delta lives in
VMEM scratch, the shift is a pltpu.roll, and the backpointer (0 = self,
1 = advance) is emitted per frame for the host-side (or scan) traceback.

The general-graph dense decoder stays on XLA (its gather/segment-max pair
is already MXU/VPU-optimal and Mosaic has no cross-lane dynamic gather);
the LVCSR top-K path shares this kernel's pruning structure.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dsr_tpu.ops.pallas import use_interpret

LANES = 128
NEG = -1e30


def _banded_kernel(ll_ref, wself_ref, wadv_ref, init_ref, bp_ref, delta_out, delta_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        # frame 0: emission only (delta0 = init + ll[0]), no transition
        delta_ref[...] = init_ref[...] + ll_ref[0]
        bp_ref[0] = jnp.zeros_like(init_ref[...])

    @pl.when(t > 0)
    def _():
        delta = delta_ref[...]                           # (R, 128) = states
        stay = delta + wself_ref[...]
        # delta[s-1]: shift by one state across the row-major (R, 128) layout
        shifted = pltpu.roll(delta.reshape(1, -1), 1, 1).reshape(delta.shape)
        adv = shifted + wadv_ref[...]
        new = jnp.maximum(stay, adv) + ll_ref[0]
        bp_ref[0] = (adv > stay).astype(jnp.float32)
        delta_ref[...] = new

    delta_out[...] = delta_ref[...]


@functools.partial(jax.jit, static_argnames=())
def _banded_impl(ll, wself, wadv, init):
    T, R, _ = ll.shape
    bp, delta = pl.pallas_call(
        _banded_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, R, LANES), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, R, LANES), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, LANES), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, R, LANES), jnp.float32),
            jax.ShapeDtypeStruct((R, LANES), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((R, LANES), jnp.float32)],
        interpret=use_interpret(),
    )(ll, wself, wadv, init)
    return bp, delta


def banded_viterbi(loglik: jnp.ndarray, self_lp: jnp.ndarray, adv_lp: jnp.ndarray):
    """Linear-chain Viterbi.  loglik: (T, S); self/adv log-probs: (S,).

    Returns (path (T,) int32, score ()).  The path is recovered with a
    host-free reversed scan over the kernel's backpointer planes.
    Convention: state s is entered from s-1 (adv) or s (self); state 0 is
    the start; the best final state is S-1.
    """
    T, S = loglik.shape
    Sp = ((S + LANES - 1) // LANES) * LANES
    R = Sp // LANES
    pad = Sp - S
    ll = jnp.pad(loglik, ((0, 0), (0, pad)), constant_values=NEG).reshape(T, R, LANES)
    wself = jnp.pad(self_lp, (0, pad), constant_values=NEG).reshape(R, LANES)
    # adv into state s uses adv_lp[s] (charged on entry); state 0 unreachable
    wadv = jnp.pad(adv_lp, (0, pad), constant_values=NEG).reshape(R, LANES)
    init = jnp.full((Sp,), NEG).at[0].set(0.0).reshape(R, LANES)
    bp, delta = _banded_impl(ll.astype(jnp.float32), wself, wadv, init)
    bp = bp.reshape(T, Sp)[:, :S]
    delta = delta.reshape(Sp)[:S]
    last = jnp.int32(S - 1)
    score = delta[S - 1]

    def back(state, bpt):
        took_adv = bpt[state] > 0.5
        prev = jnp.where(took_adv, state - 1, state)
        return prev, prev  # emit the predecessor: path[t-1]

    _, path = jax.lax.scan(back, last, bp[1:], reverse=True)
    path = jnp.concatenate([path, last[None]])
    return path.astype(jnp.int32), score
