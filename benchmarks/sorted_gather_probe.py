"""Probe: does the take-style row gather run faster with SORTED (near-
sequential) indices? Packets drift ~0.4 cells/flow-step under the
production CFL, so an occasional spatial sort would keep gather rows
nearly contiguous for hundreds of steps. If HBM row locality pays, the
2x12.6 ms/step gather cost (55% of the fused-march step) drops toward
the streaming bandwidth floor (~2-4 ms).

Also measures argsort at 1e6 (the amortized re-sort cost).
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
import time

import jax
import jax.numpy as jnp

NP = 1_000_000
NCELLS = 512 * 512
K = 384

_key = [jax.random.PRNGKey(0)]


def devnorm(shape):
    _key[0], k = jax.random.split(_key[0])
    return jax.jit(lambda k: jax.random.normal(k, shape, jnp.float32))(k)


def timed(name, fn, *a, n=5):
    try:
        r = fn(*a)
        float(jnp.sum(jnp.ravel(r)[:1]))
    except Exception as e:
        print(f"{name:46s} FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*a)
        float(jnp.sum(jnp.ravel(r)[:1]))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:46s} {dt*1e3:9.2f} ms", flush=True)
    return dt


W = devnorm((NCELLS, K))
_key[0], k = jax.random.split(_key[0])
starts_rand = jax.jit(lambda k: jax.random.randint(k, (NP,), 0, NCELLS,
                                                   jnp.int32))(k)
starts_sorted = jax.jit(jnp.sort)(starts_rand)
# "nearly sorted": sorted + small jitter, the realistic drifted state
_key[0], k2 = jax.random.split(_key[0])
starts_near = jax.jit(lambda s, k: jnp.clip(
    s + jax.random.randint(k, s.shape, -512, 512), 0,
    NCELLS - 1))(starts_sorted, k2)

gat = jax.jit(lambda W, s: W.at[s].get(mode="promise_in_bounds"))
timed("row gather K=384, RANDOM starts", gat, W, starts_rand)
timed("row gather K=384, SORTED starts", gat, W, starts_sorted)
timed("row gather K=384, NEARLY-sorted starts", gat, W, starts_near)
timed("argsort 1e6 int32", jax.jit(jnp.argsort), starts_rand)
timed("sort 1e6 + take (full reorder of (4,Np))",
      jax.jit(lambda s, x: x[:, jnp.argsort(s)]),
      starts_rand, devnorm((4, NP)))
