"""Analytic background flows.

Closed-form streamfunctions used by the reference experiments:
  * Childress–Soward cellular flow (ray_trace_sw/raytrace.m:31-37,
    rsw/swkU_tc.m:218-220), optionally translating in x at rate `c`
    (the swkU_tc time-dependent background, translation rate raXT).
  * The cellular test flow psi = cos(x) cos(y) of rsw/testparticles.m.

Each factory returns an AnalyticFlow whose parameters are traced, so rays
are differentiable w.r.t. (U0, km, a, ...).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .fields import AnalyticFlow

__all__ = ["childress_soward", "cellular", "vorticity_well", "CS_PARAMS"]

CS_PARAMS = dict(U0=0.1, km=1.0, a=0.25, c=0.0)


def _cs_psi(x, y, t, p):
    """psi = U0/km * (sin(km x') sin(km y) + a cos(km x') cos(km y)),
    x' = x - c t (c=0 gives the steady flow of raytrace.m:31)."""
    km = p["km"]
    xs = km * (x - p["c"] * t)
    ys = km * y
    return (p["U0"] / km) * (jnp.sin(xs) * jnp.sin(ys)
                             + p["a"] * jnp.cos(xs) * jnp.cos(ys))


def childress_soward(U0=0.1, km=1.0, a=0.25, c=0.0, t=0.0) -> AnalyticFlow:
    params = dict(U0=jnp.asarray(U0), km=jnp.asarray(km),
                  a=jnp.asarray(a), c=jnp.asarray(c))
    return AnalyticFlow(params=params, t=t, psi=_cs_psi)


def _cell_psi(x, y, t, p):
    return p["A"] * jnp.cos(x) * jnp.cos(y)


def cellular(A=1.0, t=0.0) -> AnalyticFlow:
    """psi = A cos x cos y — closed particle orbits, the reference's
    advection sanity check (rsw/testparticles.m:10-44)."""
    return AnalyticFlow(params=dict(A=jnp.asarray(A)), t=t, psi=_cell_psi)


def _well_psi(x, y, t, p):
    r2 = (x - p["x0"]) ** 2 + (y - p["y0"]) ** 2
    return p["A"] * jnp.exp(-r2 / (2.0 * p["sigma"] ** 2))


def vorticity_well(A=0.5, sigma=1.0, x0=np.pi, y0=np.pi) -> AnalyticFlow:
    """Gaussian streamfunction vortex ("steady vorticity-well flow",
    BASELINE.json config 2): azimuthal velocity peaking at r = sigma,
    vorticity well at the core."""
    return AnalyticFlow(params=dict(A=jnp.asarray(A),
                                    sigma=jnp.asarray(sigma),
                                    x0=jnp.asarray(x0),
                                    y0=jnp.asarray(y0)),
                        psi=_well_psi)
