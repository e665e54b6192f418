"""Vmapped parameter-sweep ensembles: the SLURM job array, on one mesh.

The reference runs its 20-config (w0, U_g) sweep as independent
single-node SLURM tasks (/root/reference/runqgsw_raytrace.sbatch:10,
parameters.txt). TPU-native redesign: the sweep is a leading ensemble
axis — each member carries its own PV spectrum, packets, time step and
spin-up delay (all traced), the solver is vmapped over the axis, and the
axis is sharded over devices via the (ensemble, packets) mesh
(parallel/sharding.py). One jitted program advances every config at
once; members whose simulation time T_i is reached freeze (dt -> 0), so
heterogeneous-duration configs coexist in one scan.

Per-member dt is legal because the QG AB3 update takes dt as data and
the exponential filter is dt-independent (qgsw_raytrace.m:222-230).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..models.coupled import (CoupledConfig, CoupledCarry, setup_coupled,
                              lockstep_step, window_threshold)
from ..models.qg import qg_step
from ..models.fields import flow_from_qk
from jax import lax

__all__ = ["EnsembleSetup", "setup_ensemble", "run_ensemble_chunk",
           "sweep_configs"]


@struct.dataclass
class EnsembleSetup:
    """Per-member traced parameters (leading axis = ensemble)."""

    dt: jnp.ndarray            # (E,)
    packet_delay: jnp.ndarray  # (E,)
    T: jnp.ndarray             # (E,) total sim time per member


def sweep_configs(base: CoupledConfig | None = None,
                  w0s=(2.0, 4.0, 8.0, 16.0),
                  ugs=(0.2, 0.4, 0.6, 0.8, 1.0)) -> list:
    """The reference's parameters.txt grid as CoupledConfigs."""
    base = base or CoupledConfig()
    return [base._replace(near_inertial_factor=w0, U_g=ug)
            for w0 in w0s for ug in ugs]


def setup_ensemble(cfgs: Sequence[CoupledConfig]):
    """Build batched carry + per-member parameters from a config list.

    All members must share (nx, L, f, Cg, n_packets, cadences); the
    swept quantities (w0 -> packet ring radius, U_g -> PV amplitude and
    hence dt) vary per member.
    """
    ref = cfgs[0]
    for c in cfgs:
        assert (c.nx, c.L, c.f, c.Cg, c.n_packets) == \
            (ref.nx, ref.L, ref.f, ref.Cg, ref.n_packets), \
            "ensemble members must share grid/packet shapes"
    # The ensemble lock-step runs without a MarchSpec (per-member dt is
    # traced, but MarchSpec.margin is static) — build the carries for
    # the non-march paths (full 6-field prev_fields).
    cfgs = [c._replace(fused_march=False) for c in cfgs]
    setups, carries = zip(*(setup_coupled(c) for c in cfgs))
    carry_b = jax.tree.map(lambda *xs: jnp.stack(xs), *carries)
    es = EnsembleSetup(
        dt=jnp.asarray([s.dt for s in setups]),
        packet_delay=jnp.asarray([s.packet_delay for s in setups]),
        T=jnp.asarray([s.T for s in setups]))
    return setups[0], es, carry_b


def run_ensemble_chunk(carry_b: CoupledCarry, es: EnsembleSetup, s, cfg,
                       n_saves: int):
    """Advance every ensemble member n_saves*packet_steps_per_save steps
    (vmapped); members past their own T freeze. `s` is any member's
    CoupledSetup (shared static parts); per-member dt/delay come from
    `es`. jit with static (s, cfg, n_saves); shard the leading axis with
    parallel.sharding.ensemble/packet shardings.
    """
    grid, disp, qp0 = s.grid, s.disp, s.qg_params

    def member_step(carry, dt, packet_delay, T):
        # A member past its T must freeze *bit-identically*: dt=0 alone
        # is not enough, because qg_step still applies the spectral
        # filter (qk *= filter decays high modes every step) and rolls
        # the AB history/step counter. Compute the step with dt=0 (so a
        # finished member cannot blow up) and then select the old carry
        # wholesale for frozen members.
        live = carry.flow_state.t < T
        live_dt = jnp.where(live, dt, 0.0)
        qp = qp0._replace(dt=live_dt)
        new = lockstep_step(
            carry,
            flow_step_fn=lambda st: qg_step(st, grid, qp),
            fields_fn=lambda st: flow_from_qk(st.qk, grid, qp.Kd2).fields,
            grid=grid, disp=disp, dt=live_dt, packet_delay=packet_delay,
            n_substeps=cfg.n_substeps, stepper=cfg.stepper,
            window_min_np=window_threshold(cfg))
        return jax.tree.map(lambda a, b: jnp.where(live, a, b), new, carry)

    def member_chunk(carry, dt, packet_delay, T):
        def one_save(c, _):
            c = lax.fori_loop(
                0, cfg.packet_steps_per_save,
                lambda i, cc: member_step(cc, dt, packet_delay, T), c)
            return c, (c.packet_x, c.packet_k, c.flow_state.t)

        return lax.scan(one_save, carry, None, length=n_saves)

    return jax.vmap(member_chunk)(carry_b, es.dt, es.packet_delay, es.T)
