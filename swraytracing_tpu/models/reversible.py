"""O(1)-memory exact gradients through the symplectic ray loop.

The reference cannot differentiate at all (MATLAB, no autodiff); naive
reverse-mode through a `lax.scan` of N ray steps stores O(N) packet
states — at 1e6 packets and 1e5+ steps that is terabytes. This module
exploits the exact invertibility of the Strang splitting
(/root/reference/ode_symplectic.m:13-37):

    step = phi1(dt/2) o phi2(dt) o phi1(dt/2)

  * phi1 (free drift, x += dt/2 C(k), k frozen) inverts in closed form;
  * phi2 (flow kick at the pre-kick position x: x' = x + dt U(x),
    k' = k - dt (grad U)^T(x) k) inverts by
      - fixed-point iteration for x  (x = x' - dt U(x); the map is a
        contraction with factor dt*|grad U| ~ the CFL number << 1, so a
        handful of iterations reaches machine precision), and
      - an exact 2x2 linear solve for k (k' = (I - dt G^T) k with
        G = grad U evaluated at the reconstructed x).

The custom VJP saves ONLY the final state; the backward pass re-derives
each previous state with the inverse map and runs the one-step VJP
there, accumulating cotangents for (x0, k0) and for the flow pytree
(spectral coefficients / analytic parameters). Memory is O(1) in the
number of steps; compute is ~2x a forward pass plus one step-VJP per
step.

Scope — why the COUPLED drivers use per-step remat instead: this module
covers steady flows (frozen snapshots / analytic backgrounds), where
the whole flow pytree is a loop constant. In the coupled lock-step run
the flow itself evolves (AB3 with 2-3 spectral history states) and the
packets see a time-BLENDED pair of snapshots; reversing that pair
requires inverting the QG step, and the exponential spectral filter
(qgsw_raytrace.m:222-230) is strongly contractive on high wavenumbers —
its inverse amplifies float roundoff by up to 1e15 at the cutoff, so a
re-integrated backward flow diverges from the forward trajectory and
the "exact" gradient is exact for the wrong trajectory. jax.checkpoint
per lock-step (run_coupled_chunk(remat=True)) is the correct trade:
memory O(steps * carry) instead of O(steps * everything), backward
recomputes each step's windows/gathers from the carried spectra
(GRAD_r02.json: fwd+bwd = 2.2x forward at the production config), and
gradient equality against no-remat is tested
(tests/test_drivers.py grad-remat tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .dispersion import Dispersion
from .rays import _phi1, symplectic_step

__all__ = ["make_reversible_integrator", "inverse_symplectic_step"]

_FP_ITERS = 8  # fixed-point iterations for the phi2 position inverse


def _phi2_inverse(x1, k1, dt, flow, alpha=0.0):
    """Invert the flow kick: find (x, k) with x1 = x + dt U(x),
    k1 = k - dt (grad U)^T(x) k."""
    def body(_, x):
        ev = flow.at(x[0], x[1], alpha)
        return x1 - dt * ev.uv

    x = lax.fori_loop(0, _FP_ITERS, body, x1)
    ev = flow.at(x[0], x[1], alpha)
    # k1 = (I - dt G^T) k, G^T rows: [u_x, v_x; u_y, v_y]
    a = 1.0 - dt * ev.u_x
    b = -dt * ev.v_x
    c = -dt * ev.u_y
    d = 1.0 - dt * ev.v_y
    det = a * d - b * c
    k = jnp.stack([(d * k1[0] - b * k1[1]) / det,
                   (-c * k1[0] + a * k1[1]) / det], axis=0)
    return x, k


def inverse_symplectic_step(x, k, dt, disp: Dispersion, flow, alpha=0.0):
    """Exact inverse of rays.symplectic_step (to fixed-point tolerance)."""
    x, k = _phi1(x, k, -0.5 * dt, disp)
    x, k = _phi2_inverse(x, k, dt, flow, alpha)
    x, k = _phi1(x, k, -0.5 * dt, disp)
    return x, k


def make_reversible_integrator(disp: Dispersion, dt: float, nsteps: int,
                               alpha: float = 0.0):
    """Build `integrate(x0, k0, flow) -> (xN, kN)` with the O(1)-memory
    custom VJP. dt/nsteps are static; flow is a differentiable pytree."""

    def fwd_loop(x, k, flow):
        def body(_, xk):
            return symplectic_step(*xk, dt, disp, flow, alpha)

        return lax.fori_loop(0, nsteps, body, (x, k))

    @jax.custom_vjp
    def integrate(x0, k0, flow):
        return fwd_loop(x0, k0, flow)

    def integrate_fwd(x0, k0, flow):
        out = fwd_loop(x0, k0, flow)
        return out, (out, flow)

    def integrate_bwd(res, cot):
        (xN, kN), flow = res
        xbar, kbar = cot
        zero_flow_bar = jax.tree.map(jnp.zeros_like, flow)

        def step_fn(x, k, fl):
            return symplectic_step(x, k, dt, disp, fl, alpha)

        def body(_, carry):
            x, k, xb, kb, fb = carry
            xp, kp = inverse_symplectic_step(x, k, dt, disp, flow, alpha)
            _, vjp = jax.vjp(step_fn, xp, kp, flow)
            xb2, kb2, fb2 = vjp((xb, kb))
            fb = jax.tree.map(jnp.add, fb, fb2)
            return xp, kp, xb2, kb2, fb

        _, _, xbar, kbar, flow_bar = lax.fori_loop(
            0, nsteps, body, (xN, kN, xbar, kbar, zero_flow_bar))
        return xbar, kbar, flow_bar

    integrate.defvjp(integrate_fwd, integrate_bwd)
    return integrate
