"""bf16 window storage probe (round-5 verdict item 2, lever b) —
REJECTED, accuracy numbers below.

Hypothesis: storing the gathered packet windows in bfloat16 (f32
accumulate in-kernel) halves the window build's HBM traffic and the
kernel's VMEM footprint. Counter-evidence:
  * the gather — the step's largest phase — costs per INDEX
    (~12.6 ns, width-independent; PERF.md roofline), so halving row
    bytes saves nothing there;
  * the march kernel is VPU-compute-bound (PERF.md round-5 table), and
    the v5e VPU computes in f32 — bf16 operands only add converts;
  * only the ~2.5 ms build phase is HBM-bound, bounding the win at
    ~1 ms of a ~25 ms step (~4%);
  * measured accuracy (this probe, 256^2, one coupled march step,
    CPU f64 truth): f32 windows 1.28e-7 max relative dk error — the
    gradinterp budget production runs live at — vs bf16 windows
    2.51e-4, a ~1900x degradation that would dominate every other
    error source in the step.

Run: python benchmarks/bf16_window_probe.py  (CPU, ~seconds)
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from swraytracing_tpu.models.coupled import CoupledConfig, setup_coupled  # noqa: E402
from swraytracing_tpu.ops import pallas_window as pwin  # noqa: E402


def main():
    cfg = CoupledConfig(nx=256, n_packets=2**12, packet_delay_days=0.0,
                        window_min_np=1)
    s, carry = setup_coupled(cfg)
    spec = s.march._replace(use_pallas=False)
    F64 = jnp.asarray(np.asarray(carry.prev_fields), jnp.float64)
    x64 = jnp.asarray(np.asarray(carry.packet_x), jnp.float64)
    k64 = jnp.asarray(np.asarray(carry.packet_k), jnp.float64)

    def march_with(Wdtype, xdtype):
        F = F64.astype(xdtype)
        W = pwin.build_gather_windows(F, spec).astype(Wdtype) \
            .astype(xdtype)
        oi, oj = pwin.packet_cells(x64.astype(xdtype)[0],
                                   x64.astype(xdtype)[1], spec)
        pw = pwin.gather_packet_windows(W, oi, oj, spec)
        if spec.combined_gather:
            pw = jnp.concatenate(
                [pw, pw], axis=1 if spec.tiles_transposed else 0)
        xk = jnp.concatenate([x64, k64], 0).astype(xdtype)
        out, _ = pwin.march_reference(
            pw, pw, xk, oi, oj,
            jnp.asarray(s.dt / cfg.n_substeps, xdtype), spec)
        return np.asarray(out, np.float64)

    ref = march_with(jnp.float64, jnp.float64)
    f32 = march_with(jnp.float32, jnp.float32)
    bf16 = march_with(jnp.bfloat16, jnp.float32)
    sc = np.abs(ref[2:]).max()
    print("f32 windows  max rel:", np.abs(f32 - ref).max() / sc)
    print("bf16 windows max rel:", np.abs(bf16 - ref).max() / sc)


if __name__ == "__main__":
    main()
