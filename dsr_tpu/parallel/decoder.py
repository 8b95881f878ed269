"""Graph-sharded WFST decoding over the `model` mesh axis (config 4).

The composed HCLG's per-state arc tables are partitioned across chips by
state range; active tokens are replicated; each shard expands only the
tokens whose states it owns and scatter-maxes into a full (S,) score board;
a `pmax` over the model axis merges the boards — this is the "active-beam
state exchanged via ICI collectives inside a batched lax.scan decode loop"
of BASELINE.json / SURVEY.md §2.3.  Utterances ride the `data` axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from dsr_tpu.asr.decoder.topk_decoder import NEG, TokenGraph


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
        jnp.pad(g.src_of_arc, (0, pad * g.a_max)),
        g.start,
        jnp.pad(g.final_weight, (0, pad), constant_values=NEG),
        Sp,
        g.a_max,
    )


def make_sharded_decode(mesh: Mesh, graph: TokenGraph, kcap: int = 256, beam: float = 1e9):
    """Build a jitted sharded decode fn: (loglik (U, T, Pdf), lengths (U,))
    → (olabels (U, T), scores (U,)).

    Arc tables are sharded over `model` by state range; loglik/lengths over
    `data`; the per-frame board merge is a pmax over `model`.
    """
    n_model = mesh.shape["model"]
    kcap = min(kcap, graph.num_states)
    g = pad_token_graph_states(graph, n_model)
    S, A = g.num_states, g.a_max
    S_shard = S // n_model

    def decode_shard(pdf, ola, wgt, dst, soa, fin, loglik, lengths):
        # pdf..: (S_shard, A); loglik: (U_shard, T, P)
        shard = jax.lax.axis_index("model")
        offset = shard * S_shard

        def one_utt(ll, length):
            T = ll.shape[0]
            states0 = jnp.zeros((kcap,), jnp.int32).at[0].set(jnp.int32(g.start))
            scores0 = jnp.full((kcap,), NEG, jnp.float32).at[0].set(0.0)
            # the carry varies over `data` (it depends on this shard's ll)
            states0 = jax.lax.pcast(states0, ("data",), to="varying")
            scores0 = jax.lax.pcast(scores0, ("data",), to="varying")

            def step(carry, inp):
                states, scores = carry
                t, llt = inp
                local = states - offset
                mine = (local >= 0) & (local < S_shard)
                li = jnp.clip(local, 0, S_shard - 1)
                w = jnp.where(mine[:, None], wgt[li], NEG)
                cand = scores[:, None] + w + llt[pdf[li]]
                cdst = dst[li]
                flat = cand.reshape(-1)
                fdst = cdst.reshape(-1)
                dense = jnp.full((S,), NEG).at[fdst].max(flat)
                # merge boards across graph shards FIRST (ICI collective) —
                # the winning arc must be selected against the merged board,
                # otherwise a losing shard's local best could win the pmax
                dense = jax.lax.pmax(dense, "model")
                arc_ids = ((states[:, None]) * A
                           + jax.lax.broadcasted_iota(jnp.int32, (kcap, A), 1)).reshape(-1)
                is_best = flat >= dense[fdst] - 1e-6
                best_arc = jnp.full((S,), -1, jnp.int32).at[fdst].max(
                    jnp.where(is_best & (flat > NEG / 2), arc_ids, -1)
                )
                best_arc = jax.lax.pmax(best_arc, "model")
                mx = jnp.max(dense)
                dense = jnp.where(dense > mx - beam, dense, NEG)
                new_scores, new_states = jax.lax.top_k(dense, kcap)
                new_states = new_states.astype(jnp.int32)
                keep = t < length
                states_o = jnp.where(keep, new_states, states)
                scores_o = jnp.where(keep, new_scores, scores)
                return (states_o, scores_o), (states_o, jnp.where(keep, best_arc[new_states], -1))

            ts = jnp.arange(T)
            (sf, scf), (tok_states, tok_arcs) = jax.lax.scan(step, (states0, scores0), (ts, ll))
            total = scf + fin_full[sf]
            slot = jnp.argmax(total)
            best_state = sf[slot]
            best_score = total[slot]

            def back(state, inp):
                t, sts, arcs = inp
                k = jnp.argmax(sts == state)
                arc = arcs[k]
                valid = (t < length) & (arc >= 0)
                prev = jnp.where(valid, soa_full[jnp.maximum(arc, 0)], state)
                olab = jnp.where(valid, ola_full.reshape(-1)[jnp.maximum(arc, 0)], 0)
                return prev, olab

            _, olabs = jax.lax.scan(back, best_state, (ts, tok_states, tok_arcs), reverse=True)
            # identical on every model shard already; the pmax marks them
            # replicated for shard_map's out_specs inference
            return jax.lax.pmax(olabs, "model"), jax.lax.pmax(best_score, "model")

        # replicate small global tables needed for traceback/final weights
        fin_full = jax.lax.all_gather(fin, "model", tiled=True)
        soa_full = jax.lax.all_gather(soa, "model", tiled=True)
        ola_full = jax.lax.all_gather(ola, "model", tiled=True)
        return jax.vmap(one_utt)(loglik, lengths)

    fn = shard_map(
        decode_shard,
        mesh=mesh,
        in_specs=(P("model"), P("model"), P("model"), P("model"), P("model"),
                  P("model"), P("data"), P("data")),
        out_specs=(P("data"), P("data")),
    )

    @jax.jit
    def run(loglik, lengths):
        return fn(g.pdf, g.olabel, g.weight, g.dst, g.src_of_arc, g.final_weight,
                  loglik, lengths)

    return run
