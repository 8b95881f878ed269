"""Canonical PartitionSpec layouts per array class (SURVEY.md §2.3).

The table below is the DSR analogue of a transformer sharding table
(pattern: SNIPPETS.md [S:122-186]): every run-time array class maps to a
PartitionSpec over the (data, model, subband) mesh axes.
"""

from __future__ import annotations

from jax.sharding import PartitionSpec as P

# ---- front end ----------------------------------------------------------
# multi-channel waveforms (U, N, S): utterances over data
WAVEFORMS = P("data")
# analysis-bank output (U, N, T, K): subbands are embarrassingly parallel
# between analysis and synthesis → natural sequence-parallel axis
SUBBAND_SNAPSHOTS = P("data", None, None, "subband")
# beamformed subbands (U, T, K)
BEAMFORMED = P("data", None, "subband")
# beamformer weights (K, N): per-subband
BEAM_WEIGHTS = P("subband")
# features (U, T, D)
FEATURES = P("data")

# ---- acoustic model -----------------------------------------------------
# GMM params (S_states, C, D): states over model when > 1 chip
GMM_PARAMS = P("model")
# GMM accumulators: same layout; reduced with psum over data
GMM_ACCUM = P("model")
# acoustic logliks (U, T, S_states)
LOGLIK = P("data", None, "model")

# ---- decoder ------------------------------------------------------------
# packed HCLG arc tensors (A,): arcs over model (graph sharding)
ARCS = P("model")
# dense decode scores (U, S): replicated over model, combined by pmax
SCORES = P("data")
# active-token lists (U, Kcap)
TOKENS = P("data")

# ---- neural AM (Conformer) ---------------------------------------------
CONFORMER_ATTN_QKV = P(None, "model")       # (d_model, heads*dh) column-shard
CONFORMER_ATTN_OUT = P("model", None)       # row-shard
CONFORMER_FFN_UP = P(None, "model")
CONFORMER_FFN_DOWN = P("model", None)
CONFORMER_ACTS = P("data", None, None)      # (U, T, d)
