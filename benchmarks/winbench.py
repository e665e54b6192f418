"""Window gather layout experiments on TPU: row-indexed (nx*ny, S*S*nf)
vs column-indexed (S*S*nf, nx*ny) window arrays, and build cost."""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
import time
import numpy as np
import jax, jax.numpy as jnp

from swraytracing_tpu.ops.grid import SpectralGrid
from swraytracing_tpu.ops import interp
from swraytracing_tpu.utils.host import put

nx = 512
Np = 1_000_000
S = 6
nf = 6
grid = SpectralGrid.square(nx, 20.0)

rng = np.random.default_rng(0)
F = put(rng.standard_normal((nf, nx, nx)).astype(np.float32))
x = put(rng.uniform(0, 20.0, (Np,)).astype(np.float32))
y = put(rng.uniform(0, 20.0, (Np,)).astype(np.float32))


def timed(name, fn, n=5):
    r = fn()
    float(r)
    t0 = time.perf_counter()
    for _ in range(n):
        float(fn())
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
    return dt


# 1. build_windows (current row layout, with the big transpose)
timed("build_windows (row layout)", jax.jit(
    lambda: jnp.sum(interp.build_windows(F)[::65536, ::32])))

# 2. column-layout build: (S*S*nf, nx*ny), no transpose
def build_cols(F, order=2):
    nf, nx, ny = F.shape
    S = 2 * order + 2
    Fp = jnp.concatenate([F[:, :, ny - order:], F, F[:, :, :order + 2]], 2)
    Fp = jnp.concatenate([Fp[:, nx - order:], Fp, Fp[:, :order + 2]], 1)
    rows = [Fp[:, sx:sx + nx, sy:sy + ny]
            for sx in range(S) for sy in range(S)]
    W = jnp.stack(rows, 0)                     # (S*S, nf, nx, ny)
    return W.reshape(S * S * nf, nx * ny)

timed("build cols (S*S*nf, nx*ny)", jax.jit(
    lambda: jnp.sum(build_cols(F)[::32, ::65536])))

# 3. gather: current row path via interp_windowed
W_row = jax.jit(interp.build_windows)(F)
def g_row():
    out = interp.interp_windowed(W_row, nf, x, y, grid)
    return jnp.sum(out)
timed("gather row-indexed (full interp_windowed)", jax.jit(g_row))

# 4. gather: column-indexed W.at[:, starts]
W_col = jax.jit(build_cols)(F)
def g_col():
    i0, j0, wx, wy = interp.cell_and_weights(x, y, grid)
    starts = i0 * grid.ny + j0
    C = interp._GATHER_CHUNK
    pad = (-Np) % C
    starts = jnp.pad(starts, (0, pad))
    wx = jnp.pad(wx, ((0, 0), (0, pad)))
    wy = jnp.pad(wy, ((0, 0), (0, pad)))
    nc = (Np + pad) // C
    st = starts.reshape(nc, C)
    wxc = jnp.moveaxis(wx.reshape(S, nc, C), 1, 0)
    wyc = jnp.moveaxis(wy.reshape(S, nc, C), 1, 0)

    def one(a):
        stc, wxx, wyy = a
        g = W_col.at[:, stc].get(mode="promise_in_bounds")  # (S*S*nf, C)
        g = g.reshape(S, S, nf, C)
        return jnp.einsum("xyfc,xc,yc->fc", g, wxx, wyy)

    out = jax.lax.map(one, (st, wxc, wyc))
    return jnp.sum(out)
timed("gather col-indexed W.at[:, starts]", jax.jit(g_col))

# 5. baseline stencil (36 indices/packet) for scale
def g_sten():
    return jnp.sum(interp.interpolate_stack(F, x, y, grid))
timed("stencil gather (36 idx/packet)", jax.jit(g_sten))
