"""Fused Pallas ray-march kernel vs the XLA reference (interpret mode
on CPU; compiled-mode parity is checked on real TPU by bench tooling)."""

import numpy as np
import jax.numpy as jnp

from swraytracing_tpu.ops.grid import SpectralGrid
from swraytracing_tpu.ops import spectral as sp
from swraytracing_tpu.ops.pallas_ray import (march_rays_pallas,
                                             march_rays_reference)
from swraytracing_tpu.models.dispersion import Dispersion
from swraytracing_tpu.models.fields import flow_from_psi_grid

DISP = Dispersion(f=3.0, Cg=1.0)


def _setup(n=64, n_packets=100, seed=0):
    grid = SpectralGrid.square(n)
    X, Y = grid.meshgrid()
    psi = 0.1 * (np.sin(X) * np.sin(Y) + 0.25 * np.cos(X) * np.cos(Y))
    fields = flow_from_psi_grid(jnp.asarray(psi), grid).fields
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray(rng.uniform(0, 2 * np.pi, (2, n_packets)))
    ang = 2 * np.pi * np.arange(n_packets) / n_packets
    k0 = jnp.asarray(8.0 * np.stack([np.cos(ang), np.sin(ang)], 0))
    return grid, fields, x0, k0


def test_pallas_march_matches_xla():
    grid, fields, x0, k0 = _setup()
    dt, nsteps = 0.005, 50
    xr, kr = march_rays_reference(fields, x0, k0, grid, DISP, dt, nsteps)
    xp, kp = march_rays_pallas(fields, x0, k0, grid, DISP, dt, nsteps,
                               block=64, interpret=True)
    np.testing.assert_allclose(np.asarray(xp), np.asarray(xr), rtol=1e-10,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(kp), np.asarray(kr), rtol=1e-10,
                               atol=1e-10)


def test_pallas_march_pads_ragged_blocks():
    grid, fields, x0, k0 = _setup(n_packets=70)  # not a block multiple
    dt, nsteps = 0.01, 10
    xr, kr = march_rays_reference(fields, x0, k0, grid, DISP, dt, nsteps)
    xp, kp = march_rays_pallas(fields, x0, k0, grid, DISP, dt, nsteps,
                               block=32, interpret=True)
    assert xp.shape == (2, 70)
    np.testing.assert_allclose(np.asarray(xp), np.asarray(xr), atol=1e-10)


def test_pallas_march_conserves_absolute_frequency():
    grid, fields, x0, k0 = _setup(n_packets=32)
    xp, kp = march_rays_pallas(fields, x0, k0, grid, DISP, 0.004, 500,
                               block=32, interpret=True)
    from swraytracing_tpu.models.fields import GriddedFlow

    flow = GriddedFlow(fields=fields, grid=grid)
    ev0 = flow.at(x0[0], x0[1])
    evN = flow.at(xp[0], xp[1])
    Om0 = DISP.absolute_frequency(k0, ev0.uv)
    OmN = DISP.absolute_frequency(kp, evN.uv)
    err = float(jnp.max(jnp.abs((OmN - Om0) / Om0)))
    assert err < 2e-3, err
