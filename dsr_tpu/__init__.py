"""dsr_tpu — a TPU-native distant speech recognition framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of the
`distantspeechrecognition` toolkit family (BTK beamforming + Millennium ASR;
see SURVEY.md): oversampled subband DFT filterbanks, adaptive beamforming
(DS / superdirective MVDR / GSC), post-filtering, source localisation and
speaker tracking, MFCC / LPC / warped-MVDR front ends, GMM-HMM acoustic
models, WFST graph construction and batched token-passing Viterbi decoding,
ML/MMI training and speaker adaptation — plus a Conformer-CTC stretch model.

Design stance (SURVEY.md §7): frames are batch dimensions, streams are
scanned pure functions, subbands are a mesh axis, and the decoder is a
batched `lax.scan` — nothing retains the reference's pull-model object graph
or SWIG layering; only capabilities and numerics carry over.
"""

__version__ = "0.1.0"
