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
NP = 1_048_576  # 2^20: block-aligned (see bench.py)

import os

# PHASE_SUBSTEPS overrides the config default (2 since round 5) so the
# kernel phase can be measured on the n=4 basis PERF's older rows used.
N_SUB = int(os.environ.get("PHASE_SUBSTEPS", "0"))
cfg = C2.Coupled2Config(nx=NX, n_packets=NP, T_Fr_days=6000.0,
                        packet_delay_days=0.01, U_g=0.4, f=3.0, Cg=1.0,
                        packet_steps_per_save=5)
if N_SUB:
    cfg = cfg._replace(n_substeps=N_SUB)
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

# --- dispatch floor: every standalone timing above pays one axon
# dispatch+fetch round trip; subtract this from standalone numbers ----------
timed("dispatch floor (trivial jit)", jax.jit(lambda x: x + 1.0),
      jnp.float32(1.0), scalar_of=lambda r: r)

# --- fused-march phases (ops/pallas_window.py) -----------------------------
mspec = s.march
if mspec is not None:
    from swraytracing_tpu.ops import pallas_window as pwin

    Wm = timed("build_gather_windows (margin, +T)",
               jax.jit(lambda F: pwin.build_gather_windows(F, mspec)), F)
    cells = jax.jit(lambda x: pwin.packet_cells(x[0], x[1], mspec))
    oi, oj = cells(carry.packet_x)
    oip = jax.jit(lambda a: pwin.pad_packet_axis(a, mspec.block))(oi)
    ojp = jax.jit(lambda a: pwin.pad_packet_axis(a, mspec.block))(oj)
    gat = jax.jit(lambda W, a, b: pwin.gather_packet_windows(W, a, b,
                                                             mspec))
    pw1 = timed("gather packet windows (1e6, K=%d)" % mspec.K,
                gat, Wm, oip, ojp)
    xkp = jax.jit(lambda x, k: pwin.pad_packet_axis(
        jnp.concatenate([x, k], axis=0), mspec.block))(
        carry.packet_x, carry.packet_k)
    mar = jax.jit(lambda p1, p2, xk, a, b: pwin.march_pallas(
        p1, p2, xk, a, b, s.dt / cfg.n_substeps, mspec))
    timed(f"fused march kernel [{mspec.stepper} x{mspec.n_substeps}]",
          mar, pw1, pw1, xkp, oip, ojp,
          scalar_of=lambda r: r[0][0, :1].sum())

# --- full chunks ----------------------------------------------------------
for stepper in ("rk23", "symplectic"):
    cfg_s = cfg._replace(stepper=stepper)
    s_s, carry_s = C2.setup_coupled2(cfg_s)  # MarchSpec follows stepper
    runf = jax.jit(functools.partial(C2.run_coupled2_chunk, s=s_s,
                                     cfg=cfg_s, n_saves=1))
    cc = runf(carry_s)[0]  # structure warmup (windows populated)
    out = timed(f"chunk of 5 lock-steps [{stepper}]", runf, cc, n=3,
                scalar_of=lambda r: r[0].packet_x[0, :1].sum())
    rate = 5 * NP / results[f"chunk of 5 lock-steps [{stepper}]"]
    print(f"{'  -> packet-steps/s':44s} {rate/1e6:9.2f} M", flush=True)
    results[f"packet-steps/s [{stepper}]"] = rate

# --- roofline accounting (march path) ---------------------------------------
floor = results.get("dispatch floor (trivial jit)", 0.0)
per_step = results["chunk of 5 lock-steps [rk23]"] / 5
parts = {k: results[k] - floor for k in results
         if k.startswith(("build_gather", "gather packet",
                          "fused march"))}
ledger = (results["flow qg2_step x1"]
          + (results["fields (grid_U: 8 transforms)"] - floor)
          + parts.get("build_gather_windows (margin, +T)", 0.0)
          + 2 * parts.get("gather packet windows (1e6, K=%d)"
                          % (s.march.K if s.march else 0), 0.0)
          + sum(v for k, v in parts.items() if k.startswith("fused march")))
print(f"{'per-step ledger (march, floor-corrected)':44s} "
      f"{ledger*1e3:9.2f} ms (chunk-measured {per_step*1e3:.2f})")
results["per-step ledger march (s)"] = ledger
print(json.dumps({k: round(v, 6) for k, v in results.items()}))
