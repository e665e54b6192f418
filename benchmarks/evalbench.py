"""In-loop A/B of blended-eval formulations + window build variants at
the headline config (512^2, 1e6 packets). Each variant runs 20 evals
inside one jitted fori_loop (positions perturbed per iteration so the
gather cannot be hoisted), so per-dispatch overhead (~40 ms on axon) is
amortized and the numbers are the true in-loop costs.

Variants:
  A. current: blend full window arrays, one windowed gather (216-wide)
  B. interleaved: ONE gather of a 432-wide row from W12 = [W1|W2],
     blend the gathered rows in-register
  C. two gathers (W1, W2 separately), blend the interpolated values
  D. build_windows (XLA) vs roofline
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from swraytracing_tpu.ops.grid import SpectralGrid
from swraytracing_tpu.ops import interp
from swraytracing_tpu.utils.host import put

NX = 512
NP = 1_000_000
NE = 20  # evals per timed call
grid = SpectralGrid.square(NX, 20.0)
rng = np.random.default_rng(0)
F1 = put(rng.standard_normal((6, NX, NX)).astype(np.float32))
F2 = put(rng.standard_normal((6, NX, NX)).astype(np.float32))
x0 = put(rng.uniform(0, 20.0, (NP,)).astype(np.float32))
y0 = put(rng.uniform(0, 20.0, (NP,)).astype(np.float32))

build = jax.jit(interp.build_windows)
W1 = build(F1)
W2 = build(F2)
W12 = jax.jit(lambda a, b: jnp.concatenate(
    [a.reshape(NX * NX, 36, 6), b.reshape(NX * NX, 36, 6)],
    axis=2).reshape(NX * NX, 432))(W1, W2)
float(jnp.sum(W12[:1, :1]))
print("setup done", flush=True)


def timed(name, fn, *a, n=3, per=NE):
    r = fn(*a)
    float(jnp.sum(jnp.ravel(r)[:1]))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*a)
        float(jnp.sum(jnp.ravel(r)[:1]))
    dt = (time.perf_counter() - t0) / n / per
    print(f"{name:46s} {dt*1e3:9.2f} ms/eval", flush=True)
    return dt


def loop(body):
    def run(x, y):
        def it(i, acc):
            a = (i + 0.5) / NE
            xx = x + 1e-3 * i
            yy = y + 1e-3 * i
            return acc + body(xx, yy, a)
        return lax.fori_loop(0, NE, it, jnp.zeros((6,), jnp.float32))
    return jax.jit(run)


def eval_A(xx, yy, a):
    W = (1.0 - a) * W1 + a * W2
    v = interp.interp_windowed(W, 6, xx, yy, grid)
    return v.sum(1)


def eval_C(xx, yy, a):
    v1 = interp.interp_windowed(W1, 6, xx, yy, grid)
    v2 = interp.interp_windowed(W2, 6, xx, yy, grid)
    return ((1.0 - a) * v1 + a * v2).sum(1)


def _win12_apply(starts, wx, wy, a):
    g = W12.at[starts].get(mode="promise_in_bounds")   # (C, 432)
    g = g.reshape(starts.shape[0], 6, 6, 12)
    gb = (1.0 - a) * g[..., :6] + a * g[..., 6:]
    return jnp.einsum("cxyf,xc,yc->fc", gb, wx, wy)


def eval_B(xx, yy, a):
    i0, j0, wx, wy = interp.cell_and_weights(xx, yy, grid)
    starts = i0 * grid.ny + j0
    C = interp._GATHER_CHUNK
    nc = NP // C
    st = starts.reshape(nc, C)
    wxc = jnp.moveaxis(wx.reshape(6, nc, C), 1, 0)
    wyc = jnp.moveaxis(wy.reshape(6, nc, C), 1, 0)
    out = lax.map(lambda t: _win12_apply(t[0], t[1], t[2], a),
                  (st, wxc, wyc))
    return jnp.moveaxis(out, 0, 1).reshape(6, NP).sum(1)


timed("A: blend windows + 216-gather (current)", loop(eval_A), x0, y0)
timed("B: interleaved 432-gather + row blend", loop(eval_B), x0, y0)
timed("C: two 216-gathers + value blend", loop(eval_C), x0, y0)

# D: window build cost + its roofline
timed("build_windows (XLA)", build, F1, per=1)
# pure 226 MB copy for reference (the build's write traffic)
cp = jax.jit(lambda w: w * 1.000001)
timed("226 MB elementwise copy (bandwidth ref)", cp, W1, per=1)
