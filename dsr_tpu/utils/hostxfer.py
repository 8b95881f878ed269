"""Device→host transfer that works around axon's missing complex support.

The axon PJRT plugin (the TPU runtime in this environment) raises
UNIMPLEMENTED when transferring complex64 arrays to the host.  `to_host`
splits complex arrays into a real/imag pair *inside* a jitted function,
transfers the float32 pair, and recombines on the host with NumPy.
Real arrays pass straight through.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _split(x):
    return jnp.real(x), jnp.imag(x)


@jax.jit
def _combine(re, im):
    return jax.lax.complex(re, im).astype(jnp.complex64)


def to_host(x) -> np.ndarray:
    """Fetch a JAX array to a NumPy array; safe for complex on axon."""
    if jnp.iscomplexobj(x):
        re, im = _split(x)
        return np.asarray(re) + 1j * np.asarray(im)
    return np.asarray(x)


def from_host(x):
    """Upload a NumPy array to the device; safe for complex on axon
    (complex host→device transfers are UNIMPLEMENTED there too)."""
    x = np.asarray(x)
    if np.iscomplexobj(x):
        return _combine(
            np.ascontiguousarray(x.real, np.float32),
            np.ascontiguousarray(x.imag, np.float32),
        )
    return jnp.asarray(x)
