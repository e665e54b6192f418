"""Headline benchmark: coupled QG flow + wave-packet raytracing throughput.

Metric: packet-steps/sec/chip — one packet advanced through one coupled
flow step counts as one packet-step. The MATLAB reference sustains
~40-45 flow steps/s with 50 packets at 256^2 on a 6-CPU node
(BASELINE.md), i.e. ~2.1e3 packet-steps/s. The BASELINE.json north star
(config 5) is 1e6 packets on a 512^2 TWO-LAYER flow at >= 10x that; the
default run here is exactly that configuration. BENCH_MODEL=qg1 selects
the one-layer (qgsw_raytrace.m) configuration instead.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

NX = int(os.environ.get("BENCH_NX", "512"))

# 2^20 ~ 1.05e6: keeps the packet axis an exact multiple of the march
# kernel block (512), so the in-step pad is a no-op — required for the
# sharded multi-chip path to stay collective-free (see lockstep_step).
NP = int(os.environ.get("BENCH_NP", str(1_048_576)))
N_SAVES = int(os.environ.get("BENCH_SAVES", "2"))
MODEL = os.environ.get("BENCH_MODEL", "qg2")
# Packet sub-stepper: rk23 (default; mirrors the reference's ode23
# sub-cycling) | rk4 | symplectic (1 flow eval per substep instead of
# rk23's 3 — ~2.5x faster at 1e6 packets, 2nd order, exactly
# conservative in steady flow; the reference's own ode_symplectic.m).
STEPPER = os.environ.get("BENCH_STEPPER", "rk23")
# Flow steps per jitted call: each call pays one axon tunnel round trip
# (~40 ms), so amortize it over enough steps — but the tunnel kills
# device executions that run for several minutes, so keep one call well
# under that (a fused-march lock-step at 1e6 packets is ~40 ms device
# time; 20 steps/call ~ 1 s).
STEPS_PER_CALL = int(os.environ.get("BENCH_STEPS_PER_CALL", "20"))
# Packet substeps per flow step. Default 2 (the shipping config since
# round 5), VALIDATED against the adaptive-ode23 oracle
# (models/coupled.py lockstep_step docstring: err 3.1-3.9e-10 at the
# headline config, ~2600x inside the reference's 1e-6 envelope); it
# halves the march kernel's stage evaluations vs the old default 4
# (+28% measured: 48.16M vs 37.57M packet-steps/s). BENCH_SUBSTEPS=4
# restores the wider-margin config.
N_SUBSTEPS = int(os.environ.get("BENCH_SUBSTEPS", "2"))
# One-kernel window build (MarchSpec.fused_build); default off until
# benchmarks/winbuild_probe.py decides.
FUSED_BUILD = os.environ.get("BENCH_FUSED_BUILD", "0") == "1"
BASELINE_PACKET_STEPS_PER_SEC = 2.1e3  # MATLAB reference, BASELINE.md


def main():
    import functools

    import jax

    # NOTE: do not enable the persistent compilation cache here — executable
    # deserialization is unimplemented on the axon TPU backend and poisons
    # every jit with a deferred UNIMPLEMENTED error.

    if MODEL == "qg2":
        from swraytracing_tpu.models.coupled2 import (
            Coupled2Config as Config, setup_coupled2 as setup,
            run_coupled2_chunk as run_chunk)
        cfg = Config(nx=NX, n_packets=NP, T_Fr_days=6000.0,
                     packet_delay_days=0.01, U_g=0.4, f=3.0, Cg=1.0)
    else:
        from swraytracing_tpu.models.coupled import (
            CoupledConfig as Config, setup_coupled as setup,
            run_coupled_chunk as run_chunk)
        cfg = Config(nx=NX, n_packets=NP, T_Fr_days=6000.0,
                     packet_delay_days=0.01, U_g=0.4, f=3.0, Cg=1.0)
    cfg = cfg._replace(packet_steps_per_save=STEPS_PER_CALL,
                       stepper=STEPPER, n_substeps=N_SUBSTEPS,
                       march_fused_build=FUSED_BUILD)
    s, carry = setup(cfg)

    run = jax.jit(functools.partial(run_chunk, s=s, cfg=cfg, n_saves=1))

    # Sync by fetching a scalar to the host: on the axon TPU backend
    # jax.block_until_ready is a no-op (returns before execution
    # finishes — CLAUDE.md / utils/profiling._sync), so every timing
    # in this repo synchronizes with a host fetch instead.
    import jax.numpy as jnp

    def sync(c):
        float(jnp.sum(c.packet_x[0, :1]))

    # Warm-up: TWO calls. The first compiles the initial-carry structure
    # (prev_win=None) and returns a carry whose window slot is populated;
    # the second compiles the steady-state structure that every
    # subsequent call reuses. Timing after one warm-up call would clock
    # a ~25 s recompile inside the window (this was BENCH_r01's 9x
    # undershoot: 395k "measured" vs the real 3.6M).
    for _ in range(2):
        carry, hist = run(carry)
        sync(carry)

    t0 = time.perf_counter()
    for _ in range(N_SAVES):
        carry, hist = run(carry)
    sync(carry)
    elapsed = time.perf_counter() - t0

    flow_steps = N_SAVES * cfg.packet_steps_per_save
    packet_steps_per_sec = flow_steps * cfg.n_packets / elapsed
    print(json.dumps({
        "metric": (f"packet-steps/sec/chip ({NP:.0e} packets, {NX}^2 "
                   f"{'two-layer' if MODEL == 'qg2' else 'one-layer'} QG)"),
        "value": round(packet_steps_per_sec, 1),
        "unit": "packet-steps/s",
        "vs_baseline": round(
            packet_steps_per_sec / BASELINE_PACKET_STEPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        # One failed transfer poisons the whole axon client (CLAUDE.md),
        # so an in-process retry cannot recover — re-exec ONCE in a
        # fresh process (fresh client, fresh tunnel connection). The
        # setup-time fetches already do bounded in-process retries for
        # transients that don't poison (utils/host.retry_fetch_float).
        import os
        import sys
        import traceback
        if os.environ.get("BENCH_RETRIED") != "1":
            traceback.print_exc()
            print("bench.py: attempt failed; re-executing once in a "
                  "fresh process", file=sys.stderr, flush=True)
            os.environ["BENCH_RETRIED"] = "1"
            os.execv(sys.executable, [sys.executable] + sys.argv)
        print(json.dumps({
            "metric": "bench-error",
            "value": 0.0,
            "unit": "packet-steps/s",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}"[:500],
        }))
        raise
