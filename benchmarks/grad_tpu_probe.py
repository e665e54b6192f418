"""Localize the matched-config TPU gradient deviation (GRAD_r05):
TPU FD agrees with the f64 oracle (~1.02-1.14 vs 1.035) but TPU AD
says 0.611 — the adjoint disagrees with the chip's OWN secants.

Short-horizon A/B on the TPU, same 256^2 / 2^14-packet build:
  kernel : shipping path (Pallas fused-march forward, custom VJP)
  twin   : s.march.use_pallas=False (the XLA reference arithmetic the
           VJP differentiates) — same device, same dtype
For each: AD gradient + central FD at two eps. If twin-AD == twin-FD
but kernel-AD != kernel-FD beyond f32 noise, the kernel VJP (or the
kernel forward it claims to match) is wrong ON TPU — CPU tests pass,
so suspect a Mosaic-lowering difference in the round-5 separable
contraction rather than the VJP math.

Run: python benchmarks/grad_tpu_probe.py [n_saves=10]
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
import json

import jax
import jax.numpy as jnp

from swraytracing_tpu.models.coupled import (CoupledConfig, setup_coupled,
                                             run_coupled_chunk)

N_SAVES = int(_sys.argv[1]) if len(_sys.argv) > 1 else 10

cfg = CoupledConfig(nx=256, n_packets=2**14, T_Fr_days=6000.0,
                    packet_delay_days=0.01, U_g=0.4, f=3.0, Cg=1.0,
                    window_min_np=2**13)
s, carry0 = setup_coupled(cfg)
assert s.march is not None
dtpin = _pl.Path(__file__).resolve().with_name("gradscience_r05.dtpin")
s = s._replace(dt=float(dtpin.read_text()))
qk0 = carry0.flow_state.qk


def make_loss(spec):
    sv = s._replace(march=spec)

    @jax.jit
    def loss(a, c0):
        c = c0.replace(flow_state=c0.flow_state.replace(
            qk=a.astype(qk0.real.dtype) * c0.flow_state.qk))
        c2, _ = run_coupled_chunk(c, sv, cfg, N_SAVES, remat=True)
        om = jnp.sqrt(cfg.f**2 + cfg.Cg**2
                      * (c2.packet_k[0]**2 + c2.packet_k[1]**2))
        return jnp.var(om)
    return loss


out = {}
one = jnp.asarray(1.0)
for name, spec in (("kernel", s.march),
                   ("twin", s.march._replace(use_pallas=False))):
    loss = make_loss(spec)
    g = float(jax.jit(jax.grad(loss))(one, carry0))
    row = dict(ad=g)
    for eps in (1e-3, 3e-3):
        fd = (float(loss(one + eps, carry0))
              - float(loss(one - eps, carry0))) / (2 * eps)
        row[f"fd_{eps:g}"] = fd
        row[f"ad_vs_fd_{eps:g}"] = abs(g - fd) / max(abs(fd), 1e-30)
    out[name] = row
    print(name, row, flush=True)

print(json.dumps(out, indent=1), flush=True)
