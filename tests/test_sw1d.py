"""1-D solver tests (sw1 / sw1d / ybj1d family)."""

import numpy as np
import jax.numpy as jnp

from swraytracing_tpu.models import sw1d

F, CG = 3.0, 1.0


def _wave_ic(n, k, eta0):
    x = np.linspace(0, 2 * np.pi, n, endpoint=False)
    w = np.sqrt(F**2 + CG**2 * k**2)
    h = eta0 * np.cos(k * x)
    u = eta0 * w / k * np.cos(k * x)
    v = eta0 * F / k * np.sin(k * x)
    return np.stack([u, v, h], axis=1), w, x


def test_sw1_linear_wave_translates():
    n, k, eta0 = 128, 3, 1e-5
    U0, w, x = _wave_ic(n, k, eta0)
    p = sw1d.SW1Params(f=F, Cg=CG)
    Us, ts, ke, pe, _ = sw1d.sw1(jnp.asarray(U0), p, 200, 200)
    T = float(ts[-1])
    h_exp = eta0 * np.cos(k * x - w * T)
    np.testing.assert_allclose(np.asarray(Us[-1][:, 2]), h_exp,
                               atol=eta0 * 5e-3)


def test_sw1_energy_bounded_nonlinear():
    n = 128
    x = np.linspace(0, 2 * np.pi, n, endpoint=False)
    U0 = np.stack([0.1 * np.sin(x), 0.05 * np.cos(2 * x),
                   0.05 * np.cos(x)], axis=1)
    p = sw1d.SW1Params(f=F, Cg=CG)
    Us, ts, ke, pe, _ = sw1d.sw1(jnp.asarray(U0), p, 400, 100)
    E = np.asarray(ke) + np.asarray(pe)
    assert np.isfinite(E).all()
    assert abs(E[-1] - E[0]) / E[0] < 1e-2


def test_sw1_particles_advance():
    n = 64
    x = np.linspace(0, 2 * np.pi, n, endpoint=False)
    U0 = np.stack([0.3 * np.ones(n), np.zeros(n), np.zeros(n)], axis=1)
    p = sw1d.SW1Params(f=F, Cg=CG)
    xp0 = jnp.asarray([0.0, 1.0, 2.0])
    Us, ts, ke, pe, xps = sw1d.sw1(jnp.asarray(U0), p, 50, 50, Xp0=xp0)
    # u field starts uniform 0.3; particle displacement ~ integral of u
    assert np.all(np.asarray(xps[-1]) > np.asarray(xp0))


def test_sw1_forced_linear_dispersion():
    """Ro=0: pure linear waves, frequency sqrt(1 + Bu k^2) (sw1d.m
    nondimensional form with f=1)."""
    n, k, Bu, eta0 = 128, 2, 0.5, 1e-4
    x = np.linspace(0, 2 * np.pi, n, endpoint=False)
    w = np.sqrt(1.0 + Bu * k**2)
    h = eta0 * np.cos(k * x)
    u = eta0 * w / (k * Bu) * Bu * np.cos(k * x)  # u = eta w/k (Bu=g'H)
    v = eta0 / k * np.sin(k * x)
    U0 = np.stack([u, v, h], axis=1)
    dt = 2e-3
    nsteps = 400
    Us, ts, ke, pe = sw1d.sw1_forced(jnp.asarray(U0), Ro=0.0, Bu=Bu,
                                     V0=0.0, Kv=1, dt=dt, nsteps=nsteps,
                                     save_every=nsteps)
    T = float(ts[-1])
    h_exp = eta0 * np.cos(k * x - w * T)
    np.testing.assert_allclose(np.asarray(Us[-1][:, 2]), h_exp,
                               atol=eta0 * 1e-2)


def test_ybj1d_free_evolution_exact():
    """V0=0: each mode evolves by exp(-i Bu k^2 t / 2) exactly (to RK3
    error)."""
    n, Bu = 64, 0.7
    x = np.linspace(0, 2 * np.pi, n, endpoint=False)
    A0 = np.exp(1j * 2 * x) + 0.5 * np.exp(-1j * 3 * x)
    dt, nsteps = 1e-3, 500
    As, ts = sw1d.ybj1d(jnp.asarray(A0), Bu, 0.0, 1, dt, nsteps, nsteps)
    T = float(ts[-1])
    A_exp = (np.exp(1j * 2 * x) * np.exp(-0.5j * Bu * 4 * T)
             + 0.5 * np.exp(-1j * 3 * x) * np.exp(-0.5j * Bu * 9 * T))
    np.testing.assert_allclose(np.asarray(As[-1]), A_exp, atol=1e-6)


def test_ybj1d_forced_conserves_action():
    """|A|^2 integral (wave action) is conserved by the YBJ equation
    (the operator is i*(Hermitian))."""
    n = 64
    x = np.linspace(0, 2 * np.pi, n, endpoint=False)
    A0 = np.exp(1j * x) + 0.3 * np.exp(2j * x)
    As, ts = sw1d.ybj1d(jnp.asarray(A0), 0.5, 0.4, 2, 1e-3, 1000, 250)
    act = [float(np.sum(np.abs(np.asarray(a)) ** 2)) for a in As]
    np.testing.assert_allclose(act, act[0], rtol=1e-6)


def test_advect1d_constant_velocity():
    u = jnp.full((32,), 0.5)
    dx = 2 * np.pi / 32
    x = jnp.asarray([0.0, 3.0])
    x2 = sw1d.advect1d(x, u, dx, 0.1)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x) + 0.05,
                               rtol=1e-12)
