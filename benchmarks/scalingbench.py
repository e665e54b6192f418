"""Packet-sharded scaling artifact (VERDICT round-1 item 6).

Two kinds of evidence, because real multi-chip hardware is unreachable
in this environment (one v5e behind the axon tunnel; CLAUDE.md):

  1. HLO collective census (the load-bearing evidence): compile the
     coupled lock-step chunk over an 8-device mesh with packets sharded
     and the flow replicated, and COUNT cross-device collectives in the
     optimized HLO. The forward pass must contain zero (flow computed
     replicated, packet march shard-local) — weak scaling is then
     communication-free by construction and efficiency at N chips is
     bounded only by per-chip load imbalance (packets are split evenly).
     The flow-gradient pass adds exactly the expected all-reduces.

  2. Wall-clock points: single real chip at the production config, plus
     the virtual-CPU-mesh curve. NOTE the virtual curve does NOT measure
     scaling — 8 virtual devices share one physical CPU's cores, so
     aggregate throughput cannot grow; it only demonstrates the sharded
     program executes end-to-end at every mesh size.

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/scalingbench.py cpu
  python benchmarks/scalingbench.py tpu      # one real v5e chip
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
import functools
import json
import re
import sys

MODE = sys.argv[1] if len(sys.argv) > 1 else "cpu"

import jax
import jax.numpy as jnp

if MODE == "cpu":
    jax.config.update("jax_platforms", "cpu")

from swraytracing_tpu.models.coupled import (CoupledConfig, setup_coupled,
                                             run_coupled_chunk)
from swraytracing_tpu.parallel import sharding as shd
from swraytracing_tpu.parallel.scaling import measure_packet_scaling

NX = 128 if MODE == "cpu" else 512
# 2^20 on TPU: multiple of the march kernel block (512) so the
# in-step pad is a no-op (see lockstep_step / bench.py)
PACKETS_PER_DEV = 32_768 if MODE == "cpu" else 1_048_576

# instruction definitions only — operand mentions of %all-reduce.N in
# other instructions are not collectives; the shape token may be a
# tuple for variadic/async collectives (count -start, not -done)
_COLLECTIVES = re.compile(
    r"= (?:\([^)]*\)|\S+) (all-reduce|all-gather|reduce-scatter|"
    r"collective-permute|all-to-all)(?:-start)?\(")


def census(fn, *args):
    """Count collective ops in the optimized HLO of jit(fn)(*args)."""
    txt = jax.jit(fn).lower(*args).compile().as_text()
    counts = {}
    for m in _COLLECTIVES.finditer(txt):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    return counts


def setup_fn(n_packets):
    cfg = CoupledConfig(nx=NX, n_packets=n_packets, T_Fr_days=6000.0,
                        packet_delay_days=0.01, U_g=0.4, f=3.0, Cg=1.0,
                        # 20 steps per jitted call on TPU amortizes the ~40 ms axon
                        # dispatch round trip (bench.py STEPS_PER_CALL)
                        packet_steps_per_save=2 if MODE == "cpu" else 20)
    s, carry = setup_coupled(cfg)
    return (s, cfg), carry


def run_fn(scfg):
    s, cfg = scfg
    return jax.jit(functools.partial(run_coupled_chunk, s=s, cfg=cfg,
                                     n_saves=1))


out = {"mode": MODE, "backend": jax.devices()[0].platform, "nx": NX,
       "packets_per_device": PACKETS_PER_DEV}

if MODE == "cpu":
    # --- HLO collective census over the full 8-device mesh -------------
    (s, cfg), carry = setup_fn(PACKETS_PER_DEV * 8)
    mesh = shd.make_mesh(jax.devices(), ensemble=1)
    carry = carry.replace(
        packet_x=shd.shard_packets(mesh, carry.packet_x),
        packet_k=shd.shard_packets(mesh, carry.packet_k),
        prev_fields=jax.device_put(carry.prev_fields,
                                   shd.replicated(mesh)))

    fwd = functools.partial(run_coupled_chunk, s=s, cfg=cfg, n_saves=1)
    out["forward_collectives"] = census(fwd, carry)

    def flow_grad(qk, c):
        c = c.replace(flow_state=c.flow_state.replace(qk=qk))
        c2, _ = run_coupled_chunk(c, s, cfg, 1, remat=True)
        return jnp.sum(c2.packet_k ** 2)

    out["flow_gradient_collectives"] = census(
        jax.grad(flow_grad), carry.flow_state.qk, carry)

    # --- wall-clock curve (execution proof, NOT a scaling measurement:
    # the 8 virtual devices share one physical CPU) ----------------------
    points = measure_packet_scaling(setup_fn, run_fn, PACKETS_PER_DEV,
                                    weak=True, iters=2, steps_per_call=2)
    out["virtual_mesh_note"] = (
        "virtual devices share one physical CPU; aggregate throughput "
        "cannot scale — points prove execution at every mesh size only")
    out["points"] = [p._asdict() for p in points]
else:
    points = measure_packet_scaling(setup_fn, run_fn, PACKETS_PER_DEV,
                                    device_counts=[1], weak=True, iters=2,
                                    steps_per_call=20)
    out["points"] = [p._asdict() for p in points]

print(json.dumps(out, indent=2))
path = _pl.Path(__file__).resolve().parents[1] / f"SCALING_r05_{MODE}.json"
path.write_text(json.dumps(out, indent=2) + "\n")
print(f"wrote {path}")
