"""A/B: carried interpolation windows vs per-step rebuild, 5 flow steps,
two-layer 512^2, 1e6 packets, rk23."""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
import time
import functools
import jax, jax.numpy as jnp

from swraytracing_tpu.models import coupled as C
from swraytracing_tpu.models import coupled2 as C2

cfg = C2.Coupled2Config(nx=512, n_packets=1_000_000, T_Fr_days=6000.0,
                        packet_delay_days=0.01, U_g=0.4, f=3.0, Cg=1.0,
                        packet_steps_per_save=5)
s, carry = C2.setup_coupled2(cfg)
print("setup done", flush=True)


def timed(name, fn, *a, n=3):
    r = fn(*a)
    jax.tree_util.tree_map(lambda x: None, r)
    float(jnp.sum(r[0].packet_x[0, :1]))
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(*a)
        float(jnp.sum(out[0].packet_x[0, :1]))
    dt = (time.perf_counter() - t0) / n
    rate = 5 * cfg.n_packets / dt
    print(f"{name:36s} {dt*1e3:9.1f} ms   {rate/1e6:7.2f}M pkt-steps/s",
          flush=True)


# B: carried windows (current code)
runB = jax.jit(functools.partial(C2.run_coupled2_chunk, s=s, cfg=cfg,
                                 n_saves=1))
timed("carried windows", runB, carry)

# A: per-step rebuild (old behavior) — defeat the hoist
orig = C.prepare_carry_windows
C.prepare_carry_windows = lambda c, *a, **k: c
C2.prepare_carry_windows = C.prepare_carry_windows
runA = jax.jit(functools.partial(C2.run_coupled2_chunk, s=s, cfg=cfg,
                                 n_saves=1))
timed("per-step rebuild (old)", runA, carry)
C.prepare_carry_windows = orig
C2.prepare_carry_windows = orig
