"""Compose-stages public API: the DSR chain as one configurable pipeline.

The reference's user-facing idiom is "build a pipeline by chaining stages
in Python" (SURVEY.md §1/L8, §5 config row) — kept here, but each stage is
a pure batched JAX function and the whole chain runs under one jit.
Streaming uses chunked calls with carried state (filterbank history is
handled by overlap in the chunker; GSC weights and CMN statistics are
explicit state, SURVEY.md §5 long-context).

Example (config 1/2):

    pipe = DsrPipeline(fb=FilterbankConfig(M=256, m=4, r=2),
                       geometry=ArrayGeometry.circular(8, 0.10),
                       beamformer=BeamformerConfig(kind="mvdr"))
    y, feats = pipe.process(x_multi, source_pos=np.array([0., 2., 0.]))
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from dsr_tpu.config import ArrayGeometry, BeamformerConfig, FilterbankConfig, FrontendConfig
from dsr_tpu.ops import beamforming as jbf
from dsr_tpu.ops import dereverb as jder
from dsr_tpu.ops import features as jft
from dsr_tpu.ops import filterbank as jfb
from dsr_tpu.ops import postfilter as jpf
from golden import room as groom


@dataclass
class DsrPipeline:
    fb: FilterbankConfig = field(default_factory=FilterbankConfig)
    geometry: ArrayGeometry = field(default_factory=lambda: ArrayGeometry.linear(8, 0.04))
    beamformer: BeamformerConfig = field(default_factory=BeamformerConfig)
    frontend: FrontendConfig = field(default_factory=FrontendConfig)
    postfilter: str | None = None   # None | 'zelinski' | 'mccowan'
    dereverb: bool = False

    def steering_delays(self, source_pos: np.ndarray) -> np.ndarray:
        POS = np.asarray(self.geometry.positions)
        return (
            groom.steering_delays(POS, np.asarray(source_pos), self.geometry.sound_speed,
                                  self.frontend.sample_rate)
            / self.frontend.sample_rate
        ).astype(np.float32)

    def beamform_subbands(self, A: jnp.ndarray, source_pos: np.ndarray,
                          gsc_state: jnp.ndarray | None = None):
        """A: (N, T, K) analysis output → (Y (T, K), new_gsc_state|None)."""
        sr = float(self.frontend.sample_rate)
        taus = self.steering_delays(source_pos)
        v = jbf.steering_vectors(jnp.asarray(taus), self.fb.M, sr)
        kind = self.beamformer.kind
        state = None
        if kind == "ds":
            Y = jbf.apply_weights(A, jbf.ds_weights(v))
        elif kind == "mvdr":
            Gamma = jbf.diffuse_coherence(
                np.asarray(self.geometry.positions), self.fb.M, sr, self.geometry.sound_speed
            )
            w = jbf.mvdr_weights(v, Gamma, self.beamformer.diagonal_loading)
            Y = jbf.apply_weights(A, w)
        elif kind == "gsc":
            wq = jbf.ds_weights(v)
            B = jbf.blocking_matrix(v)
            Y, state = jbf.gsc_nlms_block(
                A, wq, B, mu=self.beamformer.mu, eps=self.beamformer.eps,
                wa_norm_cap=self.beamformer.wa_norm_cap, wa0=gsc_state,
            )
        else:
            raise ValueError(f"unknown beamformer kind {kind!r}")
        if self.postfilter == "zelinski":
            Y = jpf.apply_postfilter(Y, jpf.zelinski_weights(A))
        elif self.postfilter == "mccowan":
            Gamma = jbf.diffuse_coherence(
                np.asarray(self.geometry.positions), self.fb.M, sr, self.geometry.sound_speed
            )
            Y = jpf.apply_postfilter(Y, jpf.mccowan_weights(A, Gamma))
        return Y, state

    def process(self, x_multi: np.ndarray, source_pos: np.ndarray):
        """(N, S) waveforms → (enhanced waveform (S,), features (T', D))."""
        x = jnp.asarray(x_multi, jnp.float32)
        A = jfb.analysis(x, self.fb)
        if self.dereverb:
            A = jder.wpe(A)
        Y, _ = self.beamform_subbands(A, source_pos)
        y = jfb.synthesis(Y, self.fb, x.shape[-1])
        feats = jft.mfcc_from_subbands(
            Y, self.fb.M, self.frontend.sample_rate,
            num_mel=self.frontend.num_mel, num_cepstra=self.frontend.num_cepstra,
            fmin=self.frontend.fmin, fmax=self.frontend.fmax,
            vtln_warp=self.frontend.vtln_warp,
        )
        if self.frontend.cmn:
            feats = jft.cmn(feats)
        return y, feats

    def process_streaming(self, chunks, source_pos: np.ndarray):
        """Iterate (N, block) chunks → yields enhanced (block,) chunks.

        Chunked-scan streaming: each chunk is analysed with L samples of
        carried history so boundary-straddling frames are recomputed.  For
        fixed beamformers (ds/mvdr) the concatenated output matches offline
        processing to filterbank precision; for GSC the re-processed overlap
        frames re-adapt (a small, standard streaming approximation).
        """
        gsc_state = None
        L = self.fb.L
        buf = None          # trailing input kept for context: last 2L samples
        emitted = 0         # samples emitted, in global coordinates
        consumed = 0        # input samples consumed, global
        for chunk in chunks:
            chunk = np.asarray(chunk, np.float32)
            buf = chunk if buf is None else np.concatenate([buf, chunk], axis=-1)
            consumed += chunk.shape[-1]
            buf_start = consumed - buf.shape[-1]
            A = jfb.analysis(jnp.asarray(buf), self.fb)
            Y, gsc_state = self.beamform_subbands(A, source_pos, gsc_state)
            y = np.asarray(jfb.synthesis(Y, self.fb, buf.shape[-1]))
            mature_end = consumed - L  # needs ≥ L future samples to be final
            if mature_end > emitted:
                yield y[emitted - buf_start : mature_end - buf_start]
                emitted = mature_end
            keep = min(2 * L, buf.shape[-1])
            buf = buf[..., -keep:]
        if buf is not None and consumed > emitted:  # flush the tail
            buf_start = consumed - buf.shape[-1]
            A = jfb.analysis(jnp.asarray(buf), self.fb)
            Y, gsc_state = self.beamform_subbands(A, source_pos, gsc_state)
            y = np.asarray(jfb.synthesis(Y, self.fb, buf.shape[-1]))
            yield y[emitted - buf_start :]
