"""Off-grid field evaluation: periodic Lagrangian stencil interpolation.

Vectorised, differentiable replacement for the reference's per-particle
double loop (/root/reference/qg_flow_ray_trace/interpolate.m:12-50 and its
duplicates interpolate_par.m / ray_trace_sw/interpolate.m). The algorithm
is identical — order-`order` 2-D Lagrangian interpolation on a
(2*order+2)^2 stencil with periodic wraparound (Durran Ch. 6) — but all
packets and all fields are evaluated in one batched gather + tensor
contraction, which XLA fuses into a single TPU kernel.

Notes vs the reference:
  * The reference's weight formula carries a spurious (-1) sign in each
    1-D basis (denominator (j-i) instead of (i-j),
    interpolate.m:37-38) that cancels in the 2-D product; we use the
    sign-correct basis in each dimension.
  * The reference adds bump=1e-10 to avoid "NaNs" (interpolate.m:13); the
    product-form basis has no division by (a - j), so no bump is needed.

Gradients: exact w.r.t. both positions (piecewise-polynomial) and field
values (linear), via JAX autodiff; the transpose of the gather is a
scatter-add, which XLA emits natively.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .grid import SpectralGrid

__all__ = [
    "lagrange_weights",
    "stencil_and_weights",
    "interp_stencil_apply",
    "interpolate",
    "interpolate_stack",
]


def _lagrange_denominators(order: int) -> np.ndarray:
    offsets = np.arange(-order, order + 2)
    denom = np.ones(len(offsets))
    for a, i in enumerate(offsets):
        for j in offsets:
            if j != i:
                denom[a] *= (i - j)
    return denom


def lagrange_weights(frac, order: int = 2):
    """1-D Lagrange basis weights at fractional cell position `frac`.

    Args:
      frac: (...,) array in [0, 1), position within the cell relative to
        the left node.
      order: stencil half-width parameter; stencil nodes are the integers
        -order .. order+1 (order=2 -> 6-point, the reference's Iord=2,
        interpolate.m:12).
    Returns:
      (..., 2*order+2) weights, summing to 1.
    """
    offsets = np.arange(-order, order + 2)
    denom = _lagrange_denominators(order)
    a = frac[..., None] - offsets  # (..., S): (frac - j) for each node j
    ws = []
    for idx in range(len(offsets)):
        mask = np.arange(len(offsets)) != idx
        ws.append(jnp.prod(a[..., mask], axis=-1) / denom[idx])
    return jnp.stack(ws, axis=-1)


def stencil_and_weights(x, y, grid: SpectralGrid, order: int = 2):
    """Compute periodic stencil indices and separable weights for packet
    positions.

    Args:
      x, y: (Np,) positions (any real values; periodic wrap applied).
    Returns:
      (ix, iy, wx, wy): ix, iy int32 (Np, S) grid indices; wx, wy (Np, S).
    """
    offsets = np.arange(-order, order + 2)
    xl = jnp.mod(x / grid.dx, grid.nx)
    yl = jnp.mod(y / grid.dy, grid.ny)
    i0 = jnp.floor(xl)
    j0 = jnp.floor(yl)
    ax = xl - i0
    ay = yl - j0
    wx = lagrange_weights(ax, order)
    wy = lagrange_weights(ay, order)
    ix = jnp.mod(i0[:, None].astype(jnp.int32) + offsets, grid.nx)
    iy = jnp.mod(j0[:, None].astype(jnp.int32) + offsets, grid.ny)
    return ix.astype(jnp.int32), iy.astype(jnp.int32), wx, wy


def interp_stencil_apply(F, ix, iy, wx, wy):
    """Apply precomputed stencil to stacked fields.

    Args:
      F: (nf, nx, ny) or (nx, ny) fields.
      ix, iy: (Np, S) int32 indices; wx, wy: (Np, S) weights.
    Returns:
      (nf, Np) or (Np,) interpolated values.
    """
    single = F.ndim == 2
    if single:
        F = F[None]
    nf, nx, ny = F.shape
    flat_idx = ix[:, :, None] * ny + iy[:, None, :]          # (Np, S, S)
    # indices are pre-wrapped into range -> skip the gather's clamp
    vals = F.reshape(nf, nx * ny).at[:, flat_idx].get(
        mode="promise_in_bounds")                            # (nf,Np,S,S)
    w2 = wx[:, :, None] * wy[:, None, :]                       # (Np, S, S)
    out = jnp.einsum("fpij,pij->fp", vals, w2)
    return out[0] if single else out


def interpolate(F, x, y, grid: SpectralGrid, order: int = 2):
    """Interpolate a single field to packet positions.

    Drop-in equivalent of the reference `interpolate(x, y, F, dx, dy)`
    (qg_flow_ray_trace/interpolate.m), vectorised over packets.
    """
    ix, iy, wx, wy = stencil_and_weights(x, y, grid, order)
    return interp_stencil_apply(F, ix, iy, wx, wy)


def interpolate_stack(F, x, y, grid: SpectralGrid, order: int = 2):
    """Interpolate a stack of fields (nf, nx, ny) at shared positions —
    the reference calls `interpolate` 12 times per evaluation
    (interpolate_U.m:5-17); here the stencil is computed once."""
    ix, iy, wx, wy = stencil_and_weights(x, y, grid, order)
    return interp_stencil_apply(F, ix, iy, wx, wy)


def _cubic_conv_weights(frac):
    """Keys cubic-convolution (a=-1/2, MATLAB interp2 'cubic' kernel)
    weights for nodes -1, 0, 1, 2 at fractional position frac in [0,1)."""
    t = frac[..., None]
    w_m1 = -0.5 * t * (1 - t) ** 2
    w_0 = 1 - 2.5 * t**2 + 1.5 * t**3
    w_1 = 0.5 * t * (1 + 4 * t - 3 * t**2)
    w_2 = 0.5 * t**2 * (t - 1)
    return jnp.concatenate([w_m1, w_0, w_1, w_2], axis=-1)


def interpolate_cubic(F, x, y, grid: SpectralGrid):
    """Periodic bicubic-convolution interpolation — the reference's
    interpolate2.m intent (MATLAB interp2 'cubic' on a periodic
    4-point halo-extended grid), implemented correctly; the reference's
    version is buggy (see why_isnt_interpolate2_working.m:32-49, which
    sweeps y-slices comparing it against the Lagrangian stencil)."""
    offsets = np.arange(-1, 3)
    xl = jnp.mod(x / grid.dx, grid.nx)
    yl = jnp.mod(y / grid.dy, grid.ny)
    i0 = jnp.floor(xl)
    j0 = jnp.floor(yl)
    wx = _cubic_conv_weights(xl - i0)
    wy = _cubic_conv_weights(yl - j0)
    ix = jnp.mod(i0[:, None].astype(jnp.int32) + offsets, grid.nx)
    iy = jnp.mod(j0[:, None].astype(jnp.int32) + offsets, grid.ny)
    return interp_stencil_apply(F, ix.astype(jnp.int32),
                                iy.astype(jnp.int32), wx, wy)
