"""Per-phase cost breakdown of the headline coupled benchmark
(512^2 two-layer QG + 1e6 packets, rk23 sub-cycling) on the real TPU.

Phases timed separately, each with scalar-fetch sync (axon's
block_until_ready is a no-op): the flow AB3 step, the grid_U field
build, the per-step window build, one blended windowed packet eval,
one rk23 substep, one full lock-step iteration, and the full chunk for
each stepper. Prints one line per phase and a JSON summary; paste the
table into PERF.md.

Roofline context: the windowed eval's floor is the take-gather at
~12.6 ns/index * Np (one index per packet) plus the O(nx*ny) window
blend; rk23 does n_substeps*3 evals per flow step, symplectic
n_substeps*1.
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))

import functools
import json
import time

import jax
import jax.numpy as jnp

from swraytracing_tpu.models import coupled2 as C2
from swraytracing_tpu.models import coupled as C
from swraytracing_tpu.models import rays
from swraytracing_tpu.models.fields import BlendedFlow
from swraytracing_tpu.models.qg2 import qg2_step, top_layer_flow
from swraytracing_tpu.ops import interp

NX = 512
NP = 1_000_000

cfg = C2.Coupled2Config(nx=NX, n_packets=NP, T_Fr_days=6000.0,
                        packet_delay_days=0.01, U_g=0.4, f=3.0, Cg=1.0,
                        packet_steps_per_save=5)
s, carry = C2.setup_coupled2(cfg)
print("setup done", flush=True)

results = {}


def timed(name, fn, *a, n=5, scalar_of=None):
    """fn must be jitted; scalar_of extracts a leaf to fetch (defaults to
    the result itself, summed)."""
    out = fn(*a)
    get = scalar_of or (lambda r: jnp.ravel(r[0] if isinstance(r, tuple)
                                            else r)[:1].sum())
    float(jnp.real(get(out)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
        float(jnp.real(get(out)))
    dt = (time.perf_counter() - t0) / n
    results[name] = dt
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
    return out


# --- flow solve: one AB3 integrating-factor step -------------------------
flow5 = jax.jit(lambda st: jax.lax.fori_loop(
    0, 5, lambda i, x: qg2_step(x, s.grid, s.ops, s.params), st))
st5 = timed("flow qg2_step x5", flow5, carry.flow_state,
            scalar_of=lambda r: jnp.abs(r.qk).sum())
results["flow qg2_step x1"] = results.pop("flow qg2_step x5") / 5
print(f"{'flow qg2_step x1':44s} {results['flow qg2_step x1']*1e3:9.2f} ms")

# --- grid_U: velocity/gradient grids from the spectrum -------------------
fields_fn = jax.jit(lambda q: top_layer_flow(q, s.grid, s.ops, s.params,
                                             False).fields)
F = timed("fields (grid_U: 8 transforms)", fields_fn, carry.flow_state.qk)

# --- window build (once per flow step) ------------------------------------
build = jax.jit(interp.build_windows)
W = timed("build_windows (512^2, 6 fields)", build, F)

# --- one blended windowed eval (the substage RHS's gather) ---------------
x, y = carry.packet_x[0], carry.packet_x[1]
flow = BlendedFlow(fields1=F, fields2=F, grid=s.grid, win1=W, win2=W)
ev = jax.jit(lambda xx, yy: flow.at(xx, yy, 0.5).uv)
timed("blended windowed eval (1e6 pkts)", ev, x, y,
      scalar_of=lambda r: r[0, :1].sum())

# stencil path for comparison (36 point-gather indices per packet)
flow_s = BlendedFlow(fields1=F, fields2=F, grid=s.grid)
ev_s = jax.jit(lambda xx, yy: flow_s.at(xx, yy, 0.5).uv)
timed("blended stencil eval (1e6 pkts)", ev_s, x, y,
      scalar_of=lambda r: r[0, :1].sum())

# --- one rk23 substep (3 evals) -------------------------------------------
sub = jax.jit(lambda xx, kk: rays.rk23_step(
    xx, kk, s.dt / cfg.n_substeps, s.disp, flow, alpha0=0.0,
    dalpha=1.0 / cfg.n_substeps))
timed("rk23 substep (3 evals)", sub, carry.packet_x, carry.packet_k,
      scalar_of=lambda r: r[0][0, :1].sum())

sub_y = jax.jit(lambda xx, kk: rays.symplectic_step(
    xx, kk, s.dt / cfg.n_substeps, s.disp, flow, alpha=0.5))
timed("symplectic substep (1 eval)", sub_y, carry.packet_x, carry.packet_k,
      scalar_of=lambda r: r[0][0, :1].sum())

# --- one full lock-step iteration -----------------------------------------
carry_w = jax.jit(functools.partial(C.prepare_carry_windows))(carry)
one = jax.jit(functools.partial(C2.coupled2_flow_packet_step, s=s, cfg=cfg))
timed("full lock-step (flow+fields+win+4 rk23)", one, carry_w,
      scalar_of=lambda r: r.packet_x[0, :1].sum())

# --- full chunks ----------------------------------------------------------
for stepper in ("rk23", "symplectic"):
    cfg_s = cfg._replace(stepper=stepper)
    runf = jax.jit(functools.partial(C2.run_coupled2_chunk, s=s, cfg=cfg_s,
                                     n_saves=1))
    cc = runf(carry)[0]  # structure warmup (windows populated)
    out = timed(f"chunk of 5 lock-steps [{stepper}]", runf, cc, n=3,
                scalar_of=lambda r: r[0].packet_x[0, :1].sum())
    rate = 5 * NP / results[f"chunk of 5 lock-steps [{stepper}]"]
    print(f"{'  -> packet-steps/s':44s} {rate/1e6:9.2f} M", flush=True)
    results[f"packet-steps/s [{stepper}]"] = rate

# --- roofline accounting ---------------------------------------------------
gather_floor = NP * 12.6e-9
results["gather floor per eval (s)"] = gather_floor
evals = cfg.n_substeps * 3
step_floor = (results["flow qg2_step x1"]
              + results["fields (grid_U: 8 transforms)"]
              + results["build_windows (512^2, 6 fields)"]
              + evals * gather_floor)
print(f"{'per-step roofline (rk23, gather-bound)':44s} "
      f"{step_floor*1e3:9.2f} ms "
      f"(measured {results['full lock-step (flow+fields+win+4 rk23)']*1e3:.2f})")
results["per-step roofline rk23 (s)"] = step_floor
print(json.dumps({k: round(v, 6) for k, v in results.items()}))
