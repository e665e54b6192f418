"""Design probes for the fused packet-march Pallas kernel.

All test arrays are generated ON DEVICE (jitted PRNG): a host `put` of a
multi-hundred-MB array hangs for minutes on the axon tunnel.

Questions (each measured on the real chip):
  1. take-style row gather W[(ncells, K)].at[starts] — does the
     ~12.6 ns/index cost hold at K = 216 (current windows), 384
     (margin-1 windows), 768 (two snapshots fused)?
  2. column gather WT[(K, ncells)][:, starts] — strided layout, would
     skip every transpose.
  3. XLA transpose (Np, K) -> (K, Np) at Np = 1e6.
  4. does Mosaic compile AT ALL on the axon backend (elementwise kernel)?
  5. march-shaped Pallas kernels: (B, K) tile + in-kernel transpose vs
     pre-transposed (K, B) tile; weighted window reduce x 4 substeps.
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
    print(f"{name:44s} {dt*1e3:9.2f} ms  ({dt/NP*1e9:6.2f} ns/packet)",
          flush=True)
    return dt


starts = devint((NP,), NCELLS)

# -- 1. row gathers at increasing width ------------------------------------
for K in (216, 384, 768):
    W = devnorm((NCELLS, K))
    timed(f"row gather (ncells,{K})[starts]",
          jax.jit(lambda W, s: W.at[s].get(mode="promise_in_bounds")),
          W, starts)
    del W

# -- 2. column gather -------------------------------------------------------
for K in (384,):
    WT = devnorm((K, NCELLS))
    timed(f"col gather ({K},ncells)[:,starts]",
          jax.jit(lambda W, s: W.at[:, s].get(mode="promise_in_bounds")),
          WT, starts)
    del WT

# -- 3. transpose ------------------------------------------------------------
G = devnorm((NP, 384))
timed("XLA transpose (1e6,384)->(384,1e6)",
      jax.jit(lambda g: g.T.copy()), G)
del G

# -- 4. Mosaic hello world ---------------------------------------------------
def _ew(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0 + 1.0

x = devnorm((1024, 512))
timed("mosaic elementwise (1024,512)",
      jax.jit(lambda x: pl.pallas_call(
          _ew, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
          in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
          out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)), x)
del x

# -- 5. march-shaped kernels ---------------------------------------------------
B, S, NF, NSUB = 512, 8, 6, 4
K = S * S * NF  # 384


def _reduce_body(w, wx, wy):
    acc = jnp.zeros((NF, w.shape[-1]), jnp.float32)
    for _ in range(NSUB):
        vals = (w * wx[None, :, None, :] * wy[None, None, :, :]).sum((1, 2))
        acc = acc + vals
    return acc


def _march(g_ref, wx_ref, wy_ref, o_ref):
    gt = g_ref[:].T                                  # (K, B)
    w = gt.reshape(NF, S, S, B)
    o_ref[:] = _reduce_body(w, wx_ref[:], wy_ref[:])


def _march_t(g_ref, wx_ref, wy_ref, o_ref):
    w = g_ref[:].reshape(NF, S, S, B)
    o_ref[:] = _reduce_body(w, wx_ref[:], wy_ref[:])


def call(kern, g, wx, wy, gspec):
    return pl.pallas_call(
        kern,
        grid=(NP // B,),
        in_specs=[
            gspec,
            pl.BlockSpec((S, B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, B), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NF, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NF, NP), jnp.float32),
    )(g, wx, wy)


WX = devnorm((S, NP))
G2 = devnorm((NP, K))
timed(f"mosaic march tile (B={B}, {NSUB} substeps)",
      jax.jit(lambda g, wx, wy: call(
          _march, g, wx, wy,
          pl.BlockSpec((B, K), lambda i: (i, 0),
                       memory_space=pltpu.VMEM))), G2, WX, WX)
del G2

GT = devnorm((K, NP))
timed(f"mosaic march tile pre-T (B={B}, {NSUB} substeps)",
      jax.jit(lambda g, wx, wy: call(
          _march_t, g, wx, wy,
          pl.BlockSpec((K, B), lambda i: (0, i),
                       memory_space=pltpu.VMEM))), GT, WX, WX)
