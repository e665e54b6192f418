"""VERDICT r3 item 2: can an IN-KERNEL Pallas DMA gather beat the XLA
take-gather's ~12.6 ns/index issue-rate floor?

The production step's largest single cost is ONE take-style row gather
(ncells, K) -> (Np, K) at ~12.6 ns per packet (PERF.md roofline,
~12.9 ms of the ~28-33 ms step at 1e6 packets). That gather also
materializes the (Np, 2K) window array in HBM (~1 GB at 1e6 packets,
written once + read back by the march kernel). The untried lever:
gather each packet's window row HBM->VMEM *inside* the kernel with
per-row async DMAs (the window array stays in ANY/HBM memory space),
so the gathered array never exists in HBM.

Measured variants (all on-device data; fetch-scalar sync):
  A. XLA take-gather (the shipping path), K in {128, 256}.
  B. XLA take-gather + in-kernel-style consume (gather feeds a jitted
     reduce — adds the HBM read-back the march kernel pays).
  C. Pallas in-kernel DMA gather, one row-DMA per packet, S-slot
     round-robin semaphore pipeline, output (Np, K) written to HBM.
  D. As C but the window row is CONSUMED in VMEM (reduced to one float
     per packet) — the true fused-march shape: no (Np, K) HBM write.

If C/D beat A at the production K, the march kernel should grow a DMA
path behind a MarchSpec flag; otherwise this file is the recorded
rejection (PERF.md roofline note).
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NP = 2**20
NCELLS = 512 * 512
BLOCK = 1024
SLOTS = 16

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
        print(f"{name:52s} FAILED {type(e).__name__}: {str(e)[:180]}",
              flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*a)
        float(jnp.sum(jnp.ravel(r)[:1]))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:52s} {dt*1e3:9.2f} ms  ({dt/NP*1e9:6.2f} ns/packet)",
          flush=True)
    return dt


def dma_gather(W, starts, K, write_out=True):
    """W (ncells, K) stays in HBM (ANY); starts (Np,); out (Np, K)."""
    Np = starts.shape[0]
    nblk = Np // BLOCK
    if write_out:
        out_spec = pl.BlockSpec((BLOCK, K), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((Np, K), W.dtype)
        kernel = functools.partial(_consume_or_copy, K=K, write_out=True)
    else:
        out_spec = pl.BlockSpec((BLOCK, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((Np, 1), W.dtype)
        kernel = functools.partial(_consume_or_copy, K=K, write_out=False)
    return pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((BLOCK,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=([pltpu.SemaphoreType.DMA((SLOTS,))]
                        if write_out else
                        [pltpu.VMEM((BLOCK, K), W.dtype),
                         pltpu.SemaphoreType.DMA((SLOTS,))]),
    )(starts, W)


def _consume_or_copy(starts_ref, w_ref, out_ref, *scr, K, write_out):
    if write_out:
        (sems,) = scr
        dst = out_ref
    else:
        scratch, sems = scr
        dst = scratch
    B = BLOCK

    def dma(p):
        return pltpu.make_async_copy(w_ref.at[starts_ref[p]], dst.at[p],
                                     sems.at[p % SLOTS])

    jax.lax.fori_loop(0, SLOTS, lambda p, _: (dma(p).start(), ())[1], ())
    jax.lax.fori_loop(
        SLOTS, B,
        lambda p, _: (dma(p - SLOTS).wait(), dma(p).start(), ())[2], ())
    jax.lax.fori_loop(B - SLOTS, B,
                      lambda p, _: (dma(p).wait(), ())[1], ())
    if not write_out:
        out_ref[:] = jnp.sum(dst[:], axis=1, keepdims=True)


if __name__ == "__main__":
    for K in (128, 256):
        W = devnorm((NCELLS, K))
        starts = devint((NP,), NCELLS)

        xla_gather = jax.jit(
            lambda W, s: W.at[s].get(mode="promise_in_bounds"))
        xla_gather_sum = jax.jit(
            lambda W, s: jnp.sum(
                W.at[s].get(mode="promise_in_bounds"), axis=1))
        tA = timed(f"A  XLA take-gather           K={K}", xla_gather,
                   W, starts)
        tB = timed(f"B  XLA gather + jit consume  K={K}",
                   xla_gather_sum, W, starts)
        tC = timed(f"C  Pallas DMA gather (out)   K={K}",
                   jax.jit(functools.partial(dma_gather, K=K,
                                             write_out=True)),
                   W, starts)
        tD = timed(f"D  Pallas DMA gather+consume K={K}",
                   jax.jit(functools.partial(dma_gather, K=K,
                                             write_out=False)),
                   W, starts)
        if tA and tC:
            print(f"   -> DMA/XLA ratio at K={K}: {tC/tA:.2f}x "
                  f"(consume {((tD or 0)/(tB or 1)):.2f}x)", flush=True)

        # correctness spot check (small)
        Ws = devnorm((4096, K))
        ss = devint((BLOCK,), 4096)
        ref = jax.jit(lambda W, s: W.at[s].get())(Ws, ss)
        got = jax.jit(functools.partial(dma_gather, K=K,
                                        write_out=True))(Ws, ss)
        ok = bool(jax.jit(lambda a, b: jnp.all(a == b))(ref, got))
        print(f"   correctness (B={BLOCK}): {'OK' if ok else 'MISMATCH'}",
              flush=True)
