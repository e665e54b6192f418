"""Canned initial conditions for the RSW solvers — the reference's
experiment library (/root/reference/rsw/swexamples.m eight cases,
wavespecic2d.m wave-bath + narrow-band geostrophic spectra,
dopplerwave.m-style superpositions, run_swkU.m / input_sw_tc.m setups).

Every builder returns (u, v, h) grids ready for rsw.rsw_init. All are
numpy/host-side (ICs are built once).
"""

from __future__ import annotations

import numpy as np

from ..ops.grid import SpectralGrid
from .exact_linear import plane_wave_ic, geostrophic_ic

__all__ = [
    "wave_packet_ic",
    "zero_pv_adjustment_ic",
    "rigid_lid_vortex_ic",
    "inertial_oscillation_ic",
    "counter_propagating_ic",
    "wave_bath_ic",
    "wave_and_geostrophic_spectrum_ic",
    "translating_cs_background",
    "doppler_wave_field",
]


def wave_packet_ic(grid: SpectralGrid, f: float, Cg: float, h0=0.1,
                   k0: int = 5, theta: float = 0.0, x0=np.pi / 6,
                   y0=-np.pi / 4, width: float = 10.0):
    """Gaussian-envelope gravity-wave packet oriented by theta
    (swexamples.m case 1, :15-34)."""
    X, Y = grid.meshgrid()
    Xc = X - grid.Lx / 2
    Yc = Y - grid.Ly / 2
    xp = Xc * np.cos(theta) - Yc * np.sin(theta)
    yp = Xc * np.sin(theta) + Yc * np.cos(theta)
    w = -np.sqrt(f**2 + Cg**2 * k0**2)
    env = np.exp(-((width * (xp - x0) / grid.Lx) ** 2)
                 - (width * (yp - y0) / grid.Ly) ** 2)
    u = h0 * w / k0 * env * np.cos(k0 * Xc)
    v = h0 * f / k0 * env * np.sin(k0 * Xc)
    h = h0 * env * np.cos(k0 * xp)
    return u, v, h


def zero_pv_adjustment_ic(grid: SpectralGrid, f: float, Cg: float,
                          h0=0.01, b: float = 10.0):
    """Localized surface jump with vorticity = f*h so PV is uniform —
    geostrophic adjustment radiates the imbalance away (swexamples.m
    case 2, :44-63)."""
    import jax.numpy as jnp

    from ..ops import spectral as sp

    X, Y = grid.meshgrid()
    Xc = X - grid.Lx / 2
    Yc = Y - grid.Ly / 2
    env = np.exp(-((b * Yc / grid.Ly) ** 2))
    h = h0 * env * Xc / (Xc**4 + 0.01)
    K2 = np.where(grid.K2 == 0, np.inf, grid.K2)
    psik = -sp.to_spectral(jnp.asarray(h), grid) / jnp.asarray(K2)
    u = f * sp.to_grid(-sp.ddy(psik, grid), grid)
    v = f * sp.to_grid(sp.ddx(psik, grid), grid)
    return np.asarray(u), np.asarray(v), h


def rigid_lid_vortex_ic(grid: SpectralGrid, f: float, Cg: float,
                        A: float = 0.1, sigma: float = 0.5):
    """Geostrophically balanced Gaussian vortex (swexamples.m rigid-lid
    vortex case): psi Gaussian, h = f psi / Cg^2."""
    X, Y = grid.meshgrid()
    r2 = (X - grid.Lx / 2) ** 2 + (Y - grid.Ly / 2) ** 2
    psi = A * np.exp(-r2 / (2 * sigma**2))
    u, v, h = geostrophic_ic(grid, f, Cg, psi)
    return np.asarray(u), np.asarray(v), np.asarray(h)


def inertial_oscillation_ic(grid: SpectralGrid, u0: float = 0.1):
    """Uniform velocity, flat surface: rotates at exactly f
    (swexamples.m inertial oscillation case)."""
    z = np.zeros(grid.shape)
    return u0 + z, z.copy(), z.copy()


def counter_propagating_ic(grid: SpectralGrid, f: float, Cg: float,
                           k_int: int = 4, eta0: float = 0.02):
    """Two equal waves with opposite propagation directions — a standing
    oscillation (swexamples.m counter-propagating pair; cf.
    rsw/standingwave.m)."""
    u1, v1, h1 = plane_wave_ic(grid, f, Cg, k_int, 0, eta0, sign=+1)
    u2, v2, h2 = plane_wave_ic(grid, f, Cg, -k_int, 0, eta0, sign=+1)
    return u1 + u2, v1 + v2, h1 + h2


def wave_bath_ic(grid: SpectralGrid, f: float, Cg: float, aw: float = 0.1,
                 k_max_wave: int = 5, seed: int = 0):
    """Random-phase spectrum of gravity waves with random frequency
    branches, |k| <= k_max_wave (wavespecic2d.m:24-40; also the wave
    bath of input_sw_tc.m). Amplitude scaled so max|h| = aw."""
    rng = np.random.default_rng(seed)
    u = np.zeros(grid.shape)
    v = np.zeros_like(u)
    h = np.zeros_like(u)
    for k in range(-grid.kmax, grid.kmax + 1):
        for l in range(0, grid.kmax + 1):
            K2 = k * k + l * l
            if K2 == 0 or K2 > k_max_wave**2:
                continue
            sign = 1 if rng.random() > 0.5 else -1
            ui, vi, hi = plane_wave_ic(grid, f, Cg, k, l, 1.0, sign=sign,
                                       phase=rng.uniform(0, 2 * np.pi))
            u += ui
            v += vi
            h += hi
    s = aw / max(np.abs(h).max(), 1e-30)
    return s * u, s * v, s * h


def wave_and_geostrophic_spectrum_ic(grid: SpectralGrid, f: float,
                                     Cg: float, aw: float = 0.1,
                                     ag: float = 0.3, k_max_wave: int = 5,
                                     k_geo_lo: int = 10,
                                     k_geo_hi: int = 13, seed: int = 0):
    """Wave bath + narrow-band random-phase geostrophic flow
    (wavespecic2d.m, the run_swkU.m configuration). Returns
    ((u, v, h) total, (ug, vg, hg) geostrophic part)."""
    rng = np.random.default_rng(seed)
    uw, vw, hw = wave_bath_ic(grid, f, Cg, aw, k_max_wave, seed)
    X, Y = grid.meshgrid()
    psi = np.zeros(grid.shape)
    for k in range(-grid.kmax, grid.kmax + 1):
        for l in range(0, grid.kmax + 1):
            K2 = k * k + l * l
            if not (k_geo_lo**2 < K2 <= k_geo_hi**2):
                continue
            phi = rng.uniform(0, 2 * np.pi)
            psi += np.cos((2 * np.pi / grid.Lx) * k * X
                          + (2 * np.pi / grid.Ly) * l * Y + phi) / max(K2, 1)
    ug, vg, hg = geostrophic_ic(grid, f, Cg, psi)
    ug, vg, hg = (np.asarray(a) for a in (ug, vg, hg))
    smax = np.sqrt(ug**2 + vg**2).max()
    s = ag / max(smax, 1e-30)
    ug, vg, hg = s * ug, s * vg, s * hg
    return (uw + ug, vw + vg, hw + hg), (ug, vg, hg)


def translating_cs_background(grid: SpectralGrid, f: float, Cg: float,
                              ag: float = 0.2, km: int = 1,
                              a_cs: float = 0.25, raXT: float = 0.1):
    """Time-dependent background (U, V) from a translating
    Childress-Soward streamfunction — the swkU_tc configuration
    (/root/reference/rsw/swkU_tc.m:202-220): Psi translates in both x
    and y at rate raXT; amplitude normalised so max|Psi| = ag each step.

    Returns background_fn(t) -> (U, V) grids for rsw.simulate_rsw.
    """
    import jax.numpy as jnp

    X, Y = grid.meshgrid()
    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    scale = Cg**2 / f

    def psi_at(t):
        xs = km * (Xj - t * raXT)
        ys = km * (Yj - t * raXT)
        psi = scale * (jnp.sin(xs) * jnp.sin(ys)
                       + a_cs * jnp.cos(xs) * jnp.cos(ys))
        return ag * psi / jnp.max(jnp.abs(psi))

    def background_fn(t):
        from ..ops import spectral as sp

        psik = sp.to_spectral(psi_at(t), grid)
        U = sp.to_grid(-sp.ddy(psik, grid), grid)
        V = sp.to_grid(sp.ddx(psik, grid), grid)
        return U, V

    return background_fn


def doppler_wave_field(grid: SpectralGrid, f: float, C0: float, times,
                       ag: float = 0.2, aw: float = 0.1, a_cs: float = 0.25,
                       km: int = 1, k_range=range(3, 11),
                       l_range=range(5, 11), seed: int = 0):
    """Linear wave superposition Doppler-shifted by a steady CS
    geostrophic flow, neglecting refraction
    (/root/reference/rsw/dopplerwave.m): each mode advances with local
    phase theta = k x + l y + phi - (omega + k U_g + l V_g) t
    (the onewave.m construction). Returns eta (nt, nx, ny) plus the
    geostrophic (ug, vg, etag)."""
    rng = np.random.default_rng(seed)
    X, Y = grid.meshgrid()
    Xc = X - grid.Lx / 2
    Yc = Y - grid.Ly / 2
    etag = ag * (np.sin(km * Xc) * np.sin(km * Yc)
                 + a_cs * np.cos(km * Xc) * np.cos(km * Yc))
    ug = -ag * km * C0**2 / f * (np.sin(km * Xc) * np.cos(km * Yc)
                                 - a_cs * np.cos(km * Xc) * np.sin(km * Yc))
    vg = ag * km * C0**2 / f * (np.cos(km * Xc) * np.sin(km * Yc)
                                - a_cs * np.sin(km * Xc) * np.cos(km * Yc))
    times = np.atleast_1d(times)
    eta = np.zeros((len(times),) + grid.shape)
    for k in k_range:
        for l in l_range:
            K2 = k * k + l * l
            phi = rng.uniform(0, 2 * np.pi)
            sgn = 1 if rng.random() > 0.5 else -1
            w = sgn * np.sqrt(f**2 + C0**2 * K2)
            for it, t in enumerate(times):
                theta = (k * Xc + l * Yc + phi
                         - (w + k * ug + l * vg) * t)
                eta[it] += aw * np.cos(theta)
    return eta, (ug, vg, etag)
