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


if __name__ == "__main__":
    for nx in (256, 512):
        F = devnorm((2, nx, nx))
        two = jax.jit(functools.partial(
            pw.build_gather_windows, spec=spec_for(nx)))
        one = jax.jit(functools.partial(
            pw.build_gather_windows, spec=spec_for(nx, fused=True)))
        tA = timed(f"two-pass build+transpose  {nx}^2 K=128", two, F)
        tB = timed(f"fused one-kernel build    {nx}^2 K=128", one, F)
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
