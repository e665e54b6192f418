"""Design probes for the fused packet-march Pallas kernel.

Questions (each measured on the real chip):
  1. take-style row gather W[(ncells, K)].at[starts] — does the
     ~12.6 ns/index cost hold at K = 216 (current windows), 384
     (margin-1 windows), 768 (two snapshots fused)?
  2. column gather WT[(K, ncells)][:, starts] — is the strided layout
     competitive (it would skip the transpose)?
  3. XLA transpose (Np, K) -> (K, Np) cost at Np = 1e6.
  4. does Mosaic compile AT ALL on the axon backend (elementwise kernel)?
  5. a march-shaped Pallas kernel: grid over packet blocks, (B, K) tile
     -> in-kernel transpose -> weighted window reduction -> (8, B) out.
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from swraytracing_tpu.utils.host import put

NP = 1_000_000
NCELLS = 512 * 512


def timed(name, fn, *a, n=5):
    try:
        r = fn(*a)
        float(jnp.sum(jnp.ravel(r)[:1]))
    except Exception as e:
        print(f"{name:44s} FAILED {type(e).__name__}: {str(e)[:160]}",
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


rng = np.random.default_rng(0)
starts = put(rng.integers(0, NCELLS, NP).astype(np.int32))

# -- 1. row gathers at increasing width ------------------------------------
for K in (216, 384, 768):
    W = put(rng.standard_normal((NCELLS, K)).astype(np.float32))
    timed(f"row gather (ncells,{K})[starts]",
          jax.jit(lambda W, s: W.at[s].get(mode="promise_in_bounds")),
          W, starts)
    del W

# -- 2. column gather -------------------------------------------------------
for K in (384,):
    WT = put(rng.standard_normal((K, NCELLS)).astype(np.float32))
    timed(f"col gather ({K},ncells)[:,starts]",
          jax.jit(lambda W, s: W.at[:, s].get(mode="promise_in_bounds")),
          WT, starts)
    del WT

# -- 3. transpose ------------------------------------------------------------
G = put(rng.standard_normal((NP, 384)).astype(np.float32))
timed("XLA transpose (1e6,384)->(384,1e6)",
      jax.jit(lambda g: g.T.copy()), G)

# -- 4. Mosaic hello world ---------------------------------------------------
def _ew(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0 + 1.0

x = put(rng.standard_normal((1024, 512)).astype(np.float32))
timed("mosaic elementwise (1024,512)",
      jax.jit(lambda x: pl.pallas_call(
          _ew, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
          in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
          out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)), x)

# -- 5. march-shaped kernel ---------------------------------------------------
# (B, K) window tile; transpose in VMEM; reduce S*S*nf window against
# per-packet weights; iterate NSUB substeps in-kernel.
B, S, NF, NSUB = 512, 8, 6, 4
K = S * S * NF  # 384


def _march(g_ref, wx_ref, wy_ref, o_ref):
    gt = g_ref[:].T                                  # (K, B)
    w = gt.reshape(NF, S, S, B)
    acc = jnp.zeros((NF, B), jnp.float32)
    for _ in range(NSUB):
        wx = wx_ref[:]                               # (S, B)
        wy = wy_ref[:]
        vals = (w * wx[None, :, None, :] * wy[None, None, :, :]).sum((1, 2))
        acc = acc + vals
    o_ref[:] = acc


def march(g, wx, wy):
    nblk = NP // B
    return pl.pallas_call(
        _march,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((B, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NF, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NF, NP), jnp.float32),
    )(g, wx, wy)


G2 = put(rng.standard_normal((NP, K)).astype(np.float32))
WX = put(rng.standard_normal((S, NP)).astype(np.float32))
timed(f"mosaic march tile (B={B}, {NSUB} substeps)",
      jax.jit(march), G2, WX, WX)

# -- 5b. same but window already transposed (K, Np) --------------------------
def _march_t(g_ref, wx_ref, wy_ref, o_ref):
    w = g_ref[:].reshape(NF, S, S, B)
    acc = jnp.zeros((NF, B), jnp.float32)
    for _ in range(NSUB):
        wx = wx_ref[:]
        wy = wy_ref[:]
        vals = (w * wx[None, :, None, :] * wy[None, None, :, :]).sum((1, 2))
        acc = acc + vals
    o_ref[:] = acc


def march_t(g, wx, wy):
    nblk = NP // B
    return pl.pallas_call(
        _march_t,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((K, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NF, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NF, NP), jnp.float32),
    )(g, wx, wy)


GT = put(rng.standard_normal((K, NP)).astype(np.float32))
timed(f"mosaic march tile pre-T (B={B}, {NSUB} substeps)",
      jax.jit(march_t), GT, WX, WX)
