"""Window-build probe: the two-pass build (XLA shifted copies +
pallas_transpose — the shipping path, ~2.5 ms at 512^2/K=128 per
PERF.md) vs the one-kernel fused build (build_windows_fused: periodic
pad + per-row-block DMA + in-VMEM shift/stack). Correctness is pinned
by tests; this measures the TPU wall time at the production shapes and
the vmapped-ensemble shape (20 members x 256^2, where the build
dominates the ensemble step).
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
import functools
import time

import jax
import jax.numpy as jnp

import swraytracing_tpu.ops.pallas_window as pw

_key = [jax.random.PRNGKey(0)]


def devnorm(shape):
    _key[0], k = jax.random.split(_key[0])
    return jax.jit(lambda k: jax.random.normal(k, shape, jnp.float32))(k)


def timed(name, fn, *a, n=10):
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
    print(f"{name:46s} {dt*1e3:9.3f} ms", flush=True)
    return dt


def spec_for(nx, margin=1, fused=False):
    return pw.MarchSpec(nx=nx, ny=nx, dx=0.1, dy=0.1, f=3.0, Cg=1.0,
                        margin=margin, nf=2, tiles_transposed=True,
                        use_pallas=True, fused_build=fused)


# --- round-5 variant: reshape-FREE fused build -----------------------------
# The round-4 fused build dies in Mosaic on "Unsupported reshape"
# (vector<8x256> -> <8x256x1>) when stacking the K shift slices. This
# variant never reshapes: for each of the r grid rows in the tile it
# concatenates K (1, ny) lane-slices into a (K, ny) vector and stores
# its in-kernel TRANSPOSE (the same 2-D .T pallas_transpose compiles in
# production) into the output row-block. Costs r transposes per tile.

import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _build_kernel_v3(fp_ref, out_ref, scratch, sem, *, nf, r, SW, ny):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        fp_ref.at[:, pl.ds(i * r, r + SW - 1), :], scratch, sem)
    dma.start()
    dma.wait()
    for row in range(r):
        cols = []
        for f in range(nf):
            for sx in range(SW):
                base = scratch[f, sx + row:sx + row + 1, :]  # (1, nyp)
                for sy in range(SW):
                    cols.append(base[:, sy:sy + ny])          # (1, ny)
        A = jnp.concatenate(cols, axis=0)                     # (K, ny)
        out_ref[row * ny:(row + 1) * ny, :] = A.T             # (ny, K)


def build_windows_fused_v3(F, spec, interpret=False):
    F = F[:spec.nf]
    nf, nx, ny = F.shape
    SW = spec.SW
    lo = spec.order + spec.margin
    hi = spec.order + 1 + spec.margin
    r = pw._fused_build_rows(nx, ny)
    Fp = jnp.concatenate([F[:, :, ny - lo:], F, F[:, :, :hi]], axis=2)
    Fp = jnp.concatenate([Fp[:, nx - lo:], Fp, Fp[:, :hi]], axis=1)
    nyp = ny + SW - 1
    return pl.pallas_call(
        functools.partial(_build_kernel_v3, nf=nf, r=r, SW=SW, ny=ny),
        grid=(nx // r,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((r * ny, spec.K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nx * ny, spec.K), F.dtype),
        scratch_shapes=[pltpu.VMEM((nf, r + SW - 1, nyp), F.dtype),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(Fp)


if __name__ == "__main__":
    for nx in (256, 512):
        F = devnorm((2, nx, nx))
        two = jax.jit(functools.partial(
            pw.build_gather_windows, spec=spec_for(nx)))
        one = jax.jit(functools.partial(
            pw.build_gather_windows, spec=spec_for(nx, fused=True)))
        v3 = jax.jit(functools.partial(
            build_windows_fused_v3, spec=spec_for(nx)))
        tA = timed(f"two-pass build+transpose  {nx}^2 K=128", two, F)
        tB = timed(f"fused one-kernel build    {nx}^2 K=128", one, F)
        tC = timed(f"fused v3 (reshape-free)   {nx}^2 K=128", v3, F)
        if tC is not None:
            dv3 = jax.jit(lambda F: jnp.max(jnp.abs(
                pw.build_gather_windows(F, spec_for(nx))
                - build_windows_fused_v3(F, spec_for(nx)))))(F)
            print(f"   v3 max dev on chip: {float(dv3):.2e}", flush=True)
        # correctness on-chip
        d = jax.jit(lambda F: jnp.max(jnp.abs(
            pw.build_gather_windows(F, spec_for(nx))
            - pw.build_gather_windows(F, spec_for(nx, fused=True)))))(F)
        print(f"   max dev on chip: {float(d):.2e}", flush=True)

    # vmapped ensemble shape: 20 members of 256^2
    Fb = devnorm((20, 2, 256, 256))
    twoV = jax.jit(jax.vmap(functools.partial(
        pw.build_gather_windows, spec=spec_for(256))))
    oneV = jax.jit(jax.vmap(functools.partial(
        pw.build_gather_windows, spec=spec_for(256, fused=True))))
    timed("two-pass, vmapped x20 members 256^2", twoV, Fb)
    timed("fused,    vmapped x20 members 256^2", oneV, Fb)
