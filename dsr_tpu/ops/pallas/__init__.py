"""Pallas TPU kernels for the four DSR hot loops (BASELINE.json north_star:
"filterbank, fractional-delay steering, adaptive-weight-update, and
beam-search inner loops as Pallas kernels").

Kernels fall back to interpreter mode automatically off-TPU so the same
tests run on the CPU mesh harness.
"""

import jax


def use_interpret() -> bool:
    return jax.default_backend() != "tpu" and "axon" not in jax.default_backend()
