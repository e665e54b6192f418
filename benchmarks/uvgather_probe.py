"""Gather-cost probe for the uv-window fused march (round 2).

PERF.md's roofline says the take-style row gather costs ~12.6 ns per
INDEX at K = 216/384/768-float rows (width-independent — an issue-rate
floor), which makes TWO per-snapshot gathers the step's bottleneck.
The uv-window mode (MarchSpec.grad_from_interp) shrinks rows to K=128
floats and the combined mode gathers BOTH snapshots in one (Np, 256)
take — this probe measures exactly those shapes:

  1. row gather at K = 128 / 256 / 384 (does the per-index floor hold
     at sub-KB rows, i.e. is one 256-float gather really ~half of two
     384-float gathers?)
  2. two 128-float gathers vs one 256-float gather (the actual choice)

All arrays generated on device (host puts of multi-hundred-MB arrays
hang on the axon tunnel); sync via scalar host fetch (block_until_ready
is a no-op on this backend — CLAUDE.md).
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
import time

import jax
import jax.numpy as jnp

NP = 1_000_000
NCELLS = 512 * 512

_key = [jax.random.PRNGKey(0)]


def devnorm(shape, dtype=jnp.float32):
    _key[0], k = jax.random.split(_key[0])
    return jax.jit(lambda k: jax.random.normal(k, shape, dtype))(k)


def devint(shape, hi):
    _key[0], k = jax.random.split(_key[0])
    return jax.jit(lambda k: jax.random.randint(k, shape, 0, hi,
                                                jnp.int32))(k)


def timed(name, fn, *a, n=5):
    try:
        r = fn(*a)
        float(jnp.sum(jnp.ravel(r)[:1]))
    except Exception as e:
        print(f"{name:44s} FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*a)
        float(jnp.sum(jnp.ravel(r)[:1]))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt*1e3:9.2f} ms  ({dt/NP*1e9:6.2f} ns/index)",
          flush=True)
    return dt


starts = devint((NP,), NCELLS)

for K in (128, 256, 384):
    W = devnorm((NCELLS, K))
    timed(f"row gather (ncells,{K})[starts]",
          jax.jit(lambda W, s: W.at[s].get(mode="promise_in_bounds")),
          W, starts)
    del W

# the actual production choice: two K=128 gathers vs one K=256 gather
W1 = devnorm((NCELLS, 128))
W2 = devnorm((NCELLS, 128))
# full-width add so XLA cannot narrow either gather (output crosses
# the jit boundary at full shape)
timed("two (ncells,128)[starts] gathers (+)",
      jax.jit(lambda a, b, s: a.at[s].get(mode="promise_in_bounds")
              + b.at[s].get(mode="promise_in_bounds")),
      W1, W2, starts)
Wc = jax.jit(lambda a, b: jnp.concatenate([a, b], axis=-1))(W1, W2)
timed("one (ncells,256)[starts] gather",
      jax.jit(lambda W, s: W.at[s].get(mode="promise_in_bounds")),
      Wc, starts)
# including the concat each step pays on the combined path
timed("concat(128+128) + (ncells,256) gather",
      jax.jit(lambda a, b, s: jnp.concatenate([a, b], axis=-1)
              .at[s].get(mode="promise_in_bounds")),
      W1, W2, starts)
