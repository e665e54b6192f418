"""Backward-pass wall time of one coupled two-layer flow step at 1e6
packets on TPU: windowed vs stencil interpolation path. All reductions
inside jit (eager ops hang on axon); sync via scalar host fetch."""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
import time, functools
import jax, jax.numpy as jnp

from swraytracing_tpu.models.coupled2 import (Coupled2Config, setup_coupled2,
                                              run_coupled2_chunk)
from swraytracing_tpu.ops import interp

cfg = Coupled2Config(nx=512, n_packets=1_000_000, T_Fr_days=6000.0,
                     packet_delay_days=0.01, U_g=0.4, f=3.0, Cg=1.0,
                     packet_steps_per_save=1)
s, carry = setup_coupled2(cfg)
print("setup done", flush=True)


def timed(name, fn, *a, n=2):
    r = fn(*a)          # compile + warmup; fn returns a SCALAR
    float(r)
    t0 = time.perf_counter()
    for _ in range(n):
        float(fn(*a))
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1e3:9.1f} ms",
          flush=True)


def loss(pk0, carry):
    c = carry.replace(packet_k=pk0)
    c, _ = run_coupled2_chunk(c, s, cfg, 1)
    return jnp.sum(c.packet_k ** 2) * 1e-6


for name, minnp in [("windowed", 65536), ("stencil", 1 << 62)]:
    interp._WINDOW_MIN_NP = minnp
    fwd = jax.jit(loss)
    timed(f"forward 1 flow step ({name})", fwd, carry.packet_k, carry)
    g = jax.jit(lambda pk, c: jnp.sum(jax.grad(loss)(pk, c) ** 2))
    timed(f"fwd+bwd 1 flow step ({name})", g, carry.packet_k, carry)
