"""Device→host fetch that tolerates the axon TPU backend.

On the axon tunnel backend, output buffers of executables that had
COMPLEX inputs cannot be copied to the host (UNIMPLEMENTED), although
they are perfectly usable device-side. `fetch` launders values through a
trivial identity executable (whose own inputs are the suspect buffers,
consumed device-to-device — which works) and transfers that executable's
fresh output buffers instead. On healthy backends this is a no-op jit
add of ~zero cost relative to any transfer.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["fetch", "fetch_float"]


@functools.partial(jax.jit)
def _identity(tree):
    return jax.tree.map(lambda x: x + jnp.zeros((), x.dtype), tree)


def fetch(tree):
    """Copy a pytree of device arrays to host numpy, robustly."""
    try:
        return jax.tree.map(np.asarray, tree)
    except Exception:
        return jax.tree.map(np.asarray, jax.block_until_ready(
            _identity(tree)))


def fetch_float(x) -> float:
    return float(fetch(x))
