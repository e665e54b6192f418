"""Pallas fused ray-march vs XLA paths on TPU: 1e6 packets, 128^2 frozen
flow (fields fit VMEM), 50 symplectic steps."""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
import time
import numpy as np
import jax, jax.numpy as jnp

from swraytracing_tpu.ops.grid import SpectralGrid
from swraytracing_tpu.ops.pallas_ray import (march_rays_pallas,
                                             march_rays_reference)
from swraytracing_tpu.models.fields import GriddedFlow
from swraytracing_tpu.models.dispersion import Dispersion
from swraytracing_tpu.models import rays
from swraytracing_tpu.utils.host import put

nx = 128
Np = 1_000_000
nsteps = 50
grid = SpectralGrid.square(nx, 2 * np.pi)
disp = Dispersion(f=3.0, Cg=1.0)

rng = np.random.default_rng(0)
fields = put(rng.standard_normal((6, nx, nx)).astype(np.float32) * 0.05)
x0 = put(rng.uniform(0, 2 * np.pi, (2, Np)).astype(np.float32))
k0 = put((rng.standard_normal((2, Np)) * 3).astype(np.float32))


def timed(name, fn, n=3):
    r = fn()
    float(r)
    t0 = time.perf_counter()
    for _ in range(n):
        float(fn())
    dt = (time.perf_counter() - t0) / n
    rate = Np * nsteps / dt
    print(f"{name:28s} {dt*1e3:9.1f} ms  {rate/1e6:8.2f}M packet-steps/s",
          flush=True)


pal = jax.jit(lambda: jnp.sum(march_rays_pallas(
    fields, x0, k0, grid, disp, 1e-3, nsteps)[1]))
timed("pallas fused march", pal)

ref = jax.jit(lambda: jnp.sum(march_rays_reference(
    fields, x0, k0, grid, disp, 1e-3, nsteps)[1]))
timed("XLA stencil march", ref)


def windowed_march():
    flow = GriddedFlow(fields=fields, grid=grid).windowed()

    def body(_, xk):
        return rays.symplectic_step(*xk, 1e-3, disp, flow)

    x, k = jax.lax.fori_loop(0, nsteps, body, (x0, k0))
    return jnp.sum(k)


timed("XLA windowed march", jax.jit(windowed_march))
