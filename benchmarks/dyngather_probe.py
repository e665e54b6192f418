"""Probe: does Mosaic's tpu.dynamic_gather (take_along_axis lowering)
compile and how fast is a VMEM shared-table gather on the real chip?

The hot op of the framework is a per-packet stencil/window gather. XLA's
HBM gather costs ~12.6 ns/index; the fields at 512^2 are only 6.3 MB —
if an in-VMEM dynamic_gather is faster per index, a fused Pallas eval
kernel beats the windowed XLA path. Measures take_along_axis(x, idx,
axis=1) at x = (6|8, nx*ny) for nx in {256, 512}."""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from swraytracing_tpu.utils.host import put


def probe(rows, nx, dtype=jnp.float32):
    N = nx * nx
    rng = np.random.default_rng(0)
    x = put(rng.standard_normal((rows, N)).astype(dtype))
    idx = put(rng.integers(0, N, (rows, N)).astype(np.int32))

    def kern(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    fn = jax.jit(lambda x, i: pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((rows, N), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, i))
    try:
        r = fn(x, idx)
        float(jnp.sum(r[0, :1]))
    except Exception as e:
        print(f"rows={rows} nx={nx} {dtype.__name__}: FAILED "
              f"{type(e).__name__}: {str(e)[:200]}", flush=True)
        return
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        r = fn(x, idx)
        float(jnp.sum(r[0, :1]))
    dt = (time.perf_counter() - t0) / n
    n_elems = rows * N
    print(f"rows={rows} nx={nx} {dtype.__name__}: {dt*1e6:9.1f} us  "
          f"({dt/n_elems*1e9:6.3f} ns/elem, {n_elems/1e6:.2f}M elems)",
          flush=True)


for nx in (128, 256, 512):
    probe(8, nx)
probe(6, 512)
probe(8, 512, jnp.bfloat16)

# XLA HBM-gather comparison at the same index count
N = 512 * 512
rng = np.random.default_rng(1)
x = put(rng.standard_normal((8, N)).astype(np.float32))
idx = put(rng.integers(0, N, (8, N)).astype(np.int32))
xg = jax.jit(lambda x, i: jnp.take_along_axis(x, i, axis=1))
r = xg(x, idx); float(jnp.sum(r[0, :1]))
t0 = time.perf_counter()
for _ in range(20):
    r = xg(x, idx); float(jnp.sum(r[0, :1]))
dt = (time.perf_counter() - t0) / 20
print(f"XLA take_along_axis 8x{N}: {dt*1e6:9.1f} us "
      f"({dt/(8*N)*1e9:6.3f} ns/elem)", flush=True)
