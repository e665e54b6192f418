"""Fused Pallas ray-march kernel for frozen gridded flows.

The XLA path for N symplectic steps writes packet state to HBM every
step and re-launches the gather; this kernel marches a BLOCK of packets
through ALL steps in one program with the velocity/gradient grids
resident in VMEM — HBM traffic is the fields once (they stay cached
across grid programs via a constant index_map) plus the packet state
once, instead of O(steps).

Layout: packet state is coordinate-first (2, Np) so the packet axis is
the TPU lane dimension (see ops/interp.py); blocks are (2, block).
Fields (6, nx, ny) float32 must fit VMEM (<= ~192^2 for 6 fields f32;
at production 512^2 the flow fields are ~6 MB in bf16 and 12 MB in f32 —
near the 16 MB VMEM limit, so the kernel targets the frozen-snapshot
configurations (BASELINE configs 1-3) and moderate grids; the coupled
512^2 path uses the XLA gather).

The stencil gather inside the kernel uses the same flattened
jnp.take formulation as ops.interp — Mosaic lowers gathers from VMEM;
`interpret=True` is used on CPU for correctness tests, and the wrapper
falls back to the pure-XLA integrator automatically if Mosaic rejects
the kernel on a given backend/shape.

Cites: symplectic splitting ode_symplectic.m:13-37; stencil
interpolation qg_flow_ray_trace/interpolate.m:12-50.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .grid import SpectralGrid

__all__ = ["march_rays_pallas", "march_rays_reference"]


def _kernel_weights(frac, order):
    """Lagrange basis weights with pure-Python constants (a Pallas
    kernel may not capture numpy arrays). frac (B,) -> (S, B)."""
    offsets = list(range(-order, order + 2))
    ws = []
    for i in offsets:
        denom = 1.0
        w = jnp.ones_like(frac)
        for j in offsets:
            if j != i:
                denom *= float(i - j)
                w = w * (frac - j)
        ws.append(w / denom)
    return jnp.stack(ws, axis=0)


def _gather_fields(F_ref, xl, yl, nx, ny, order):
    """Interpolate the 6 stacked fields at fractional grid coords
    (xl, yl) in [0, nx) x [0, ny). Returns (6, B)."""
    offsets = list(range(-order, order + 2))
    i0 = jnp.floor(xl)
    j0 = jnp.floor(yl)
    wx = _kernel_weights(xl - i0, order)           # (S, B)
    wy = _kernel_weights(yl - j0, order)
    i0i = i0.astype(jnp.int32)
    j0i = j0.astype(jnp.int32)
    ix = jnp.stack([jnp.mod(i0i + o, nx) for o in offsets], axis=0)
    iy = jnp.stack([jnp.mod(j0i + o, ny) for o in offsets], axis=0)
    flat = ix[:, None, :] * ny + iy[None, :, :]    # (S, S, B)
    Fflat = F_ref[:].reshape(6, nx * ny)
    vals = jnp.take(Fflat, flat, axis=1)           # (6, S, S, B)
    w2 = wx[:, None, :] * wy[None, :, :]
    # mul+sum (not einsum/dot): keeps the packet axis on lanes, no
    # transpose (see ops/interp.py)
    return (vals * w2[None]).sum((1, 2))


def _march_kernel(F_ref, x_ref, k_ref, xo_ref, ko_ref, *, nsteps, dt,
                  f, Cg2, dx, dy, nx, ny, order):
    x = x_ref[:]            # (2, B)
    k = k_ref[:]

    def body(_, xk):
        x, k = xk
        # phi1(dt/2): free drift
        om = jnp.sqrt(f * f + Cg2 * jnp.sum(k * k, axis=0))
        x = x + (0.5 * dt * Cg2 / om)[None] * k
        # phi2(dt): flow kick at pre-kick position
        xl = jnp.mod(x[0] / dx, nx)
        yl = jnp.mod(x[1] / dy, ny)
        ev = _gather_fields(F_ref, xl, yl, nx, ny, order)  # (6, B)
        u, v, ux, uy, vx, vy = ev
        x = x + dt * jnp.stack([u, v], axis=0)
        dk = jnp.stack([ux * k[0] + vx * k[1],
                        uy * k[0] + vy * k[1]], axis=0)
        k = k - dt * dk
        # phi1(dt/2)
        om = jnp.sqrt(f * f + Cg2 * jnp.sum(k * k, axis=0))
        x = x + (0.5 * dt * Cg2 / om)[None] * k
        return x, k

    x, k = jax.lax.fori_loop(0, nsteps, body, (x, k))
    xo_ref[:] = x
    ko_ref[:] = k


def march_rays_pallas(fields, x0, k0, grid: SpectralGrid, disp, dt: float,
                      nsteps: int, block: int = 2048, order: int = 2,
                      interpret: bool = False):
    """March all packets nsteps symplectic steps through a frozen
    GriddedFlow's fields entirely on-chip.

    Args:
      fields: (6, nx, ny) stacked [u, v, ux, uy, vx, vy].
      x0, k0: (2, Np); Np padded up to a multiple of `block` internally.
    Returns (xN, kN).
    """
    Np = x0.shape[1]
    pad = (-Np) % block
    if pad:
        x0 = jnp.concatenate([x0, jnp.zeros((2, pad), x0.dtype)], axis=1)
        k0 = jnp.concatenate([k0, jnp.ones((2, pad), k0.dtype)], axis=1)
    nb = x0.shape[1] // block

    kern = functools.partial(
        _march_kernel, nsteps=nsteps, dt=dt, f=disp.f, Cg2=disp.Cg**2,
        dx=grid.dx, dy=grid.dy, nx=grid.nx, ny=grid.ny, order=order)

    out = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((6, grid.nx, grid.ny), lambda i: (0, 0, 0),
                         memory_space=pl.ANY if interpret
                         else pltpu.VMEM),
            pl.BlockSpec((2, block), lambda i: (0, i)),
            pl.BlockSpec((2, block), lambda i: (0, i)),
        ],
        out_specs=(
            pl.BlockSpec((2, block), lambda i: (0, i)),
            pl.BlockSpec((2, block), lambda i: (0, i)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x0.shape, x0.dtype),
            jax.ShapeDtypeStruct(k0.shape, k0.dtype),
        ),
        interpret=interpret,
    )(fields, x0, k0)
    xN, kN = out
    return xN[:, :Np], kN[:, :Np]


def march_rays_reference(fields, x0, k0, grid: SpectralGrid, disp,
                         dt: float, nsteps: int, order: int = 2):
    """Pure-XLA march with identical semantics (the fallback and the
    numerical reference for the kernel)."""
    from ..models.fields import GriddedFlow
    from ..models.rays import symplectic_step

    flow = GriddedFlow(fields=fields, grid=grid, order=order)

    def body(_, xk):
        return symplectic_step(*xk, dt, disp, flow)

    return jax.lax.fori_loop(0, nsteps, body, (x0, k0))
