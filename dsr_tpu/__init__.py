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

import os as _os

import jax as _jax

# Persistent compilation cache: axon remote-compiles every new shape (tens of
# seconds); caching makes warm starts instant.  Opt out: DSR_TPU_NO_CACHE=1.
# The directory is keyed by the host CPU's feature set: XLA:CPU AOT results
# compiled under a different feature mask (e.g. +prefer-no-scatter from
# another machine/toolchain) load with a "could lead to SIGILL" warning and
# HAVE segfaulted `backend_compile_and_load` mid-suite (round 5) — a shared
# cache dir must never mix host feature sets.
if not _os.environ.get("DSR_TPU_NO_CACHE"):
    def _cache_key() -> str:
        import hashlib
        import platform

        feats = ""
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    if line.startswith("flags"):
                        feats = " ".join(sorted(line.split(":", 1)[1].split()))
                        break
        except OSError:
            pass
        blob = f"{platform.machine()}|{feats}".encode()
        return hashlib.sha1(blob).hexdigest()[:10]

    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get(
            "DSR_TPU_COMP_CACHE",
            _os.path.expanduser(f"~/.cache/jax_comp_{_cache_key()}")),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
