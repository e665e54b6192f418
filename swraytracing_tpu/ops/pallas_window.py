"""Fused wave-packet march: all packet substeps of one flow step in one
Pallas kernel, fed by ONE window gather per packet per snapshot.

This is the production-scale version of the windowed interpolation idea
(ops/interp.build_windows): the reference sub-cycles each flow step with
ode23, paying a 6x6 Lagrangian stencil gather per packet per stage
(/root/reference/qg_flow_ray_trace/interpolate.m:12-50 via
interpolate_U.m and qgsw_raytrace.m:149,258-268). The XLA windowed path
already turned the 36 point gathers into one take-style gather per
packet per STAGE; at 1e6 packets the 12 rk23 stage gathers per flow
step still cost ~12.6 ms each (the ~12.6 ns/index take-gather floor of
this TPU) plus a 3x226 MB window blend per stage (PERF.md roofline).

Key observation: over ONE flow step a packet moves at most
dt*(|U|+Cg)/dx cells — under the production CFL that is < 1 cell. So a
stencil window gathered once per flow step, widened by a `margin` of
cells on each side, contains every stencil node that any substage of
that step can touch. The march then needs NO gathers at all:

  per flow step:
    build W  = cell windows of the new snapshot    (K, nx*ny), K = nf*SW^2
    gather   pw = W[:, cell(x)] per packet, both snapshots  (2 gathers)
    kernel   all n_substeps x stages entirely on-chip: Lagrange weights,
             margin shift, time blend, dispersion, RK/symplectic update

The kernel reads each packet's 2K window floats ONCE from HBM and keeps
them in VMEM across all stages (the XLA path re-reads them per stage),
and its VJP avoids the pathological XLA layout the blended-window
backward hits (a (nc,S,S,nf,C) broadcast with the nf=6 axis minor is
lane-padded 6->128: 906 MB -> 19.3 GB, OOM — measured round 2).

Within-margin arithmetic is IDENTICAL to the reference stencil: the
extended weights place the same 6 Lagrange weights (Durran Ch. 6,
interpolate.m:37-44) at the packet's current cell inside the wider
window; positions that drift past the margin are clamped to the nearest
in-window stencil and counted in the `overflow` output (callers assert
it stays zero; see required_margin).

Layouts: packet windows are (K, Np) — window component on sublanes,
packet axis on lanes (CLAUDE.md layout rules). `tiles_transposed=True`
instead feeds raw (Np, K) gather rows and transposes each (B, K) tile
in-kernel, trading an XLA transpose for in-VMEM shuffles.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "MarchSpec",
    "required_margin",
    "build_margin_windows",
    "build_gather_windows",
    "pallas_transpose",
    "packet_cells",
    "gather_packet_windows",
    "march_reference",
    "march_pallas",
    "fused_march",
    "pad_packet_axis",
]


class MarchSpec(NamedTuple):
    """Static configuration of the fused march (hashable; closed over by
    jit and passed as a nondiff argument to the custom VJP)."""

    nx: int
    ny: int
    dx: float
    dy: float
    f: float
    Cg: float
    n_substeps: int = 4
    stepper: str = "rk23"          # 'rk23' | 'rk4' | 'symplectic'
    order: int = 2                 # Lagrange stencil half-width (Iord)
    margin: int = 1                # drift allowance, cells per flow step
    nf: int = 6                    # fields: u, v, ux, uy, vx, vy
    block: int = 512               # packets per kernel program
    tiles_transposed: bool = False # pw passed as (Np, K) gather rows
    interpret: bool = False        # Pallas interpreter mode (CPU tests)
    use_pallas: bool = True        # False = XLA reference forward (CPU)
    # Windows carry only (u, v) (nf=2); the kernel evaluates the
    # velocity-gradient tensor by DIFFERENTIATING the Lagrange
    # interpolant (w'_i(fx) w_j(fy) / dx) instead of interpolating
    # spectrally differentiated grids (grid_U.m:1-18). 3x smaller
    # windows -> the gather (the step's bottleneck, PERF.md) shrinks;
    # accuracy cost quantified in benchmarks/gradinterp_accuracy.py:
    # ~1.3e-7 relative at 512^2 (vs 3e-9 for the spectral-gradient
    # path) — below the f32 epsilon production runs live at.
    grad_from_interp: bool = False
    # Both snapshots' packet windows arrive in ONE gathered array,
    # stacked on the K axis ((2K, Np), or (Np, 2K) tiles_transposed) —
    # halves the number of gather indices per flow step (the take-
    # gather costs per INDEX; two K-row gathers cost twice one 2K-row
    # gather at small K). fused_march's pw2 argument is then a dummy.
    combined_gather: bool = False
    # Build the (ncells, K) window array in ONE Pallas kernel (periodic
    # pad in XLA, then per-row-block DMA + in-VMEM shift/stack/reshape)
    # instead of XLA shifted copies + the tiled transpose — halves the
    # window-array HBM traffic of the build phase. Requires
    # tiles_transposed and nx % rows-per-tile == 0; falls back to the
    # two-pass build otherwise.
    fused_build: bool = False

    @property
    def S(self) -> int:
        return 2 * self.order + 2

    @property
    def SW(self) -> int:
        return self.S + 2 * self.margin

    @property
    def K(self) -> int:
        return self.nf * self.SW * self.SW


def required_margin(dt: float, u_max: float, Cg: float, dx: float,
                    headroom: float = 3.0, nx: int | None = None,
                    order: int = 2) -> int:
    """Margin (cells) covering the worst-case packet drift over one flow
    step: |dx/dt| <= |U| + |Cg_group| <= u_max + Cg (group speed of the
    SW dispersion is bounded by Cg). `headroom` scales u_max because the
    flow can strengthen past its initial maximum during the run; the
    kernel's overflow counter catches violations at runtime.

    With `nx` given, the margin is capped so the window (SW = 2*order+2
    + 2*margin) never exceeds the periodic grid — a wider window would
    duplicate cells and the build would slice out of range (hit when a
    CFL recheck on a strongly-decayed flow produced a huge dt). A
    capped margin that proves too small surfaces through the kernel's
    overflow counter, which drivers treat as discard-and-retry/halt."""
    m = max(1, int(np.ceil(dt * (headroom * u_max + Cg) / dx)))
    if nx is not None:
        m = min(m, max_margin(nx, order))
    return m


def max_margin(nx: int, order: int = 2) -> int:
    """Largest margin whose window still fits the periodic grid."""
    return max(1, (nx - (2 * order + 2)) // 2)


# ---------------------------------------------------------------------------
# Window build + gather (XLA side)
# ---------------------------------------------------------------------------

def build_margin_windows(F, spec: MarchSpec):
    """(nf, nx, ny) fields -> (K, nx*ny) cell-window array W:
    W[(f*SW + sx)*SW + sy, i*ny + j] = F[f, i + sx - (order+margin),
    j + sy - (order+margin)] (periodic). Rows are shifted flattened
    copies of the fields — contiguous writes, no relayout (the
    (ncells, K)-minor layout of interp.build_windows costs a 400 MB
    transpose per step at 512^2/margin-1)."""
    F = F[:spec.nf]  # grad_from_interp (nf=2) keeps only (u, v)
    nf, nx, ny = F.shape
    SW = spec.SW
    lo = spec.order + spec.margin
    hi = spec.order + 1 + spec.margin
    if lo > min(nx, ny) or hi > min(nx, ny):
        raise ValueError(
            f"march window (margin={spec.margin}, SW={SW}) exceeds the "
            f"{nx}x{ny} periodic grid; cap the margin with "
            "required_margin(..., nx=) / max_margin")
    Fp = jnp.concatenate([F[:, :, ny - lo:], F, F[:, :, :hi]], axis=2)
    Fp = jnp.concatenate([Fp[:, nx - lo:], Fp, Fp[:, :hi]], axis=1)
    rows = [Fp[f, sx:sx + nx, sy:sy + ny].reshape(nx * ny)
            for f in range(nf) for sx in range(SW) for sy in range(SW)]
    return jnp.stack(rows, axis=0)


def _t_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:].T


def _pallas_transpose_impl(W, block: int, interpret: bool):
    A, B = W.shape
    if B % block == 0:      # tile the minor axis (the (K, ncells) case)
        in_s = pl.BlockSpec((A, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        out_s = pl.BlockSpec((block, A), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        grid = (B // block,)
    elif A % block == 0:    # tile the major axis (the backward call)
        in_s = pl.BlockSpec((block, B), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        out_s = pl.BlockSpec((B, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
        grid = (A // block,)
    else:
        raise ValueError(f"neither axis of {W.shape} is a multiple of "
                         f"{block}")
    return pl.pallas_call(
        _t_kernel,
        grid=grid,
        in_specs=[in_s],
        out_specs=out_s,
        out_shape=jax.ShapeDtypeStruct((B, A), W.dtype),
        interpret=interpret,
    )(W)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def pallas_transpose(W, block: int = 2048, interpret: bool = False):
    """Tiled on-chip transpose (K, N) -> (N, K). XLA's transpose of the
    window array runs far below HBM bandwidth on this backend (probe:
    ~41 ms for 1.5 GB); tiling it through VMEM keeps it streaming.

    custom_vjp: a transpose's cotangent is a transpose, but pallas_call
    has no autodiff rule — without this the FLOW-gradient path on TPU
    (d loss / d qk through build_gather_windows) fails to linearize
    under jax.checkpoint (found by the round-4 run-scale grad demo; the
    CPU tests never hit it because use_pallas=False there). The
    backward tiles the other axis (N % block still holds)."""
    return _pallas_transpose_impl(W, block, interpret)


def _pallas_transpose_fwd(W, block, interpret):
    return _pallas_transpose_impl(W, block, interpret), None


def _pallas_transpose_bwd(block, interpret, _, ct):
    return (_pallas_transpose_impl(ct, block, interpret),)


pallas_transpose.defvjp(_pallas_transpose_fwd, _pallas_transpose_bwd)


def _fused_build_rows(nx: int, ny: int) -> int:
    """Grid rows per fused-build tile: ~2048 cells per tile, nx-divisible."""
    r = max(1, 2048 // ny)
    while r > 1 and nx % r:
        r //= 2
    return r


def _build_kernel(fp_ref, out_ref, scratch, sem, *, nf, r, SW, ny,
                  interpret):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        fp_ref.at[:, pl.ds(i * r, r + SW - 1), :], scratch, sem)
    dma.start()
    dma.wait()
    rows = []
    for f in range(nf):
        for sx in range(SW):
            sub = scratch[f, sx:sx + r, :]          # (r, nyp)
            for sy in range(SW):
                rows.append(sub[:, sy:sy + ny])     # (r, ny)
    W = jnp.stack(rows, axis=-1)                    # (r, ny, K)
    out_ref[:] = W.reshape(r * ny, nf * SW * SW)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def build_windows_fused(F, spec: MarchSpec):
    """ONE-kernel window build: (nf, nx, ny) -> (ncells, K) directly.

    The two-pass build (build_margin_windows: K shifted flattened
    copies; then pallas_transpose) writes AND re-reads the (K, ncells)
    array through HBM. Here the periodic pad happens in XLA (a ~1.05x
    field copy), and each kernel program DMAs its row-block of the
    padded field once into VMEM and emits the (r*ny, K) tile by static
    shifts — the window array is written exactly once.

    VJP: the build is linear in F, so the backward is its XLA
    linear-transpose (grad runs only; forward runs never pay it).
    """
    return _build_windows_fused_impl(F, spec)


def _build_windows_fused_impl(F, spec: MarchSpec):
    F = F[:spec.nf]
    nf, nx, ny = F.shape
    SW = spec.SW
    lo = spec.order + spec.margin
    hi = spec.order + 1 + spec.margin
    r = _fused_build_rows(nx, ny)
    Fp = jnp.concatenate([F[:, :, ny - lo:], F, F[:, :, :hi]], axis=2)
    Fp = jnp.concatenate([Fp[:, nx - lo:], Fp, Fp[:, :hi]], axis=1)
    nyp = ny + SW - 1
    return pl.pallas_call(
        functools.partial(_build_kernel, nf=nf, r=r, SW=SW, ny=ny,
                          interpret=spec.interpret),
        grid=(nx // r,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((r * ny, spec.K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nx * ny, spec.K), F.dtype),
        scratch_shapes=[pltpu.VMEM((nf, r + SW - 1, nyp), F.dtype),
                        pltpu.SemaphoreType.DMA(())],
        interpret=spec.interpret,
    )(Fp)


def _build_windows_fused_fwd(F, spec):
    # residual is F itself (a few-MB field stack) — only its
    # shape/dtype are consumed, but residuals must be jax types
    return _build_windows_fused_impl(F, spec), F


def _build_windows_fused_bwd(spec, F, ct):
    lin = lambda F_: build_margin_windows(F_, spec).T
    (dF,) = jax.linear_transpose(
        lin, jax.ShapeDtypeStruct(F.shape, F.dtype))(ct)
    return (dF,)


build_windows_fused.defvjp(_build_windows_fused_fwd,
                           _build_windows_fused_bwd)


def build_gather_windows(F, spec: MarchSpec):
    """Cell-window array in the layout gather_packet_windows expects:
    (K, ncells) natural when tiles_transposed=False, else (ncells, K)
    for contiguous row gathers (the fast path on this TPU — column
    gathers measured ~4x slower per index)."""
    if spec.tiles_transposed and spec.fused_build and spec.use_pallas \
            and not spec.interpret:
        return build_windows_fused(F, spec)
    W = build_margin_windows(F, spec)
    if not spec.tiles_transposed:
        return W
    ncells = W.shape[1]
    if spec.interpret or not spec.use_pallas or ncells % 2048:
        return W.T
    return pallas_transpose(W)


def packet_cells(x, y, spec: MarchSpec):
    """Origin cell of each packet: (oi, oj) int32 in [0, n)."""
    xl = jnp.mod(x / spec.dx, spec.nx)
    yl = jnp.mod(y / spec.dy, spec.ny)
    oi = jnp.floor(xl).astype(jnp.int32)
    oj = jnp.floor(yl).astype(jnp.int32)
    oi = jnp.where(oi >= spec.nx, oi - spec.nx, oi)
    oj = jnp.where(oj >= spec.ny, oj - spec.ny, oj)
    return oi, oj


def gather_packet_windows(W, oi, oj, spec: MarchSpec):
    """One take-style gather per packet: W (K, ncells) -> pw.

    tiles_transposed=False: gather columns -> (K, Np) directly.
    tiles_transposed=True: gather rows of W.T's layout — caller must
    pass W already transposed to (ncells, K); returns (Np, K)."""
    starts = oi * spec.ny + oj
    if spec.tiles_transposed:
        return W.at[starts].get(mode="promise_in_bounds")      # (Np, K)
    return W.at[:, starts].get(mode="promise_in_bounds")       # (K, Np)


def pad_packet_axis(arr, block: int, axis: int = -1):
    """Pad the packet axis up to a multiple of `block`."""
    n = arr.shape[axis]
    pad = (-n) % block
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return jnp.pad(arr, widths)


# ---------------------------------------------------------------------------
# Shared march arithmetic (runs inside the kernel AND as the XLA
# reference/backward implementation — one source of truth)
# ---------------------------------------------------------------------------

def _lagrange_ws(fr, order: int):
    """S Lagrange basis weights at fractional position fr (B,) in [0,1)
    for nodes -order..order+1 (interpolate.m:33-44, sign-correct form —
    see ops/interp.lagrange_weights). Python-unrolled for Mosaic."""
    offs = list(range(-order, order + 2))
    denom = []
    for i in offs:
        d = 1.0
        for j in offs:
            if j != i:
                d *= (i - j)
        denom.append(d)
    a = [fr - o for o in offs]
    ws = []
    for idx in range(len(offs)):
        p = None
        for j in range(len(offs)):
            if j == idx:
                continue
            p = a[j] if p is None else p * a[j]
        ws.append(p * (1.0 / denom[idx]))
    return ws


def _lagrange_dws(fr, order: int):
    """d/dfr of the S Lagrange basis weights (exact — the basis is a
    degree-(S-1) polynomial): L_i'(fr) = sum_m Pi_{j != i,m}(fr - o_j)
    / denom_i. Python-unrolled like _lagrange_ws; the physical
    derivative needs a further 1/dx scale at the call site."""
    offs = list(range(-order, order + 2))
    denom = []
    for i in offs:
        d = 1.0
        for j in offs:
            if j != i:
                d *= (i - j)
        denom.append(d)
    a = [fr - o for o in offs]
    dws = []
    for idx in range(len(offs)):
        s = None
        for m in range(len(offs)):
            if m == idx:
                continue
            p = None
            for j in range(len(offs)):
                if j == idx or j == m:
                    continue
                p = a[j] if p is None else p * a[j]
            if p is None:  # order 0: two nodes, constant derivative
                p = jnp.ones_like(fr)
            s = p if s is None else s + p
        dws.append(s * (1.0 / denom[idx]))
    return dws


def _extended_weights(ws, d, spec: MarchSpec):
    """Place the S stencil weights into the SW-wide window at integer
    shift d (B,) in [-margin, margin]: row p of the result holds
    ws[p - d - margin] (zero outside). Select-sum instead of a dynamic
    gather — d is per-packet, and per-lane dynamic indexing of the
    sublane axis is not a TPU vector op."""
    SW, m = spec.SW, spec.margin
    B = d.shape[0]
    pio = lax.broadcasted_iota(jnp.int32, (SW, B), 0)
    t = pio - (d + m)[None, :]
    out = jnp.zeros((SW, B), ws[0].dtype)
    for s in range(len(ws)):
        out = out + jnp.where(t == s, ws[s][None, :], jnp.zeros((), ws[0].dtype))
    return out


def _eval_fields(pw1, pw2, x0, x1, alpha, oi, oj, spec: MarchSpec):
    """Interpolate the 6 time-blended fields at packet positions from
    the margin windows. pw*: (nf, SW, SW, B); returns ((nf, B), ov)
    where ov (B,) int32 is the margin excess (0 when in-window).

    Identical arithmetic to BlendedFlow.at on the windowed path
    (models/fields.py) for |drift| <= margin: same Lagrange weights,
    same field values, blend folded into the reduction."""
    nx, ny, m = spec.nx, spec.ny, spec.margin
    xl = jnp.mod(x0 * (1.0 / spec.dx), nx)
    yl = jnp.mod(x1 * (1.0 / spec.dy), ny)
    i0f = jnp.floor(xl)
    j0f = jnp.floor(yl)
    fx = xl - i0f
    fy = yl - j0f
    i0 = i0f.astype(jnp.int32)
    j0 = j0f.astype(jnp.int32)
    i0 = jnp.where(i0 >= nx, i0 - nx, i0)   # floor(mod) fp edge
    j0 = jnp.where(j0 >= ny, j0 - ny, j0)
    di = i0 - oi
    di = jnp.where(di > nx // 2, di - nx, di)
    di = jnp.where(di < -(nx // 2), di + nx, di)
    dj = j0 - oj
    dj = jnp.where(dj > ny // 2, dj - ny, dj)
    dj = jnp.where(dj < -(ny // 2), dj + ny, dj)
    ov = jnp.maximum(jnp.maximum(jnp.abs(di), jnp.abs(dj)) - m, 0)
    di = jnp.clip(di, -m, m)
    dj = jnp.clip(dj, -m, m)
    wex = _extended_weights(_lagrange_ws(fx, spec.order), di, spec)
    wey = _extended_weights(_lagrange_ws(fy, spec.order), dj, spec)
    one = jnp.asarray(1.0, pw1.dtype)
    v = ((one - alpha) * pw1 + alpha * pw2)           # blend
    # SEPARABLE contraction (round-5 kernel roofline, PERF.md): the 2-D
    # stencil weight is wex (x) wey, so contract the y axis once per
    # field (ty = sum_j v[..,j,:] wey_j) and finish with SW-long x
    # contractions — ~1.4x fewer VPU ops than materializing the
    # (SW, SW, B) weight products and running SW^2-long reductions
    # per output (exact reassociation of the same products; tested
    # against the stencil-gather oracle at the usual tolerances).
    ty = (v * wey[None, None, :, :]).sum(2)           # (nf, SW, B)
    if not spec.grad_from_interp:
        vals = (ty * wex[None, :, :]).sum(1)          # (nf, B)
        return vals, ov
    # nf=2 windows (u, v): the velocity-gradient tensor comes from the
    # DERIVATIVE of the Lagrange interpolant instead of interpolating
    # spectrally differentiated grids (grid_U.m:1-18) — ~1.3e-7
    # relative at 512^2 (benchmarks/gradinterp_accuracy.py), below the
    # f32 epsilon production runs live at, and 3x less gather traffic.
    dwex = _extended_weights(_lagrange_dws(fx, spec.order), di, spec)
    dwey = _extended_weights(_lagrange_dws(fy, spec.order), dj, spec)
    tdy = (v * dwey[None, None, :, :]).sum(2)         # (nf, SW, B)
    u = (ty[0] * wex).sum(0)
    vv = (ty[1] * wex).sum(0)
    ux = (ty[0] * dwex).sum(0) * (1.0 / spec.dx)
    uy = (tdy[0] * wex).sum(0) * (1.0 / spec.dy)
    vx = (ty[1] * dwex).sum(0) * (1.0 / spec.dx)
    vy = (tdy[1] * wex).sum(0) * (1.0 / spec.dy)
    return jnp.stack([u, vv, ux, uy, vx, vy]), ov


def _march_core(pw1, pw2, x0, x1, k0, k1, oi, oj, sub_dt, spec: MarchSpec):
    """All n_substeps of one flow step. pw*: (nf, SW, SW, B); sub_dt is
    the substep length (dt_flow / n_substeps; 0 freezes packets). The
    flow blend fraction ramps alpha = (i + stage)/n over the step,
    exactly the reference's interpolate_U convention
    (interpolate_U.m:19-23). Steppers match models/rays.py: rk23 =
    Bogacki-Shampine stages of MATLAB's ode23 (qgsw_raytrace.m:149),
    rk4, symplectic = Strang phi1/phi2/phi1 (ode_symplectic.m:33-37)."""
    n = spec.n_substeps
    gH = spec.Cg ** 2
    f2 = spec.f ** 2
    h = sub_dt
    ov_tot = jnp.zeros(x0.shape, jnp.int32)

    def rhs(xx0, xx1, kk0, kk1, alpha):
        F, ov = _eval_fields(pw1, pw2, xx0, xx1, alpha, oi, oj, spec)
        om = jnp.sqrt(f2 + gH * (kk0 * kk0 + kk1 * kk1))
        inv = 1.0 / om
        return (F[0] + gH * kk0 * inv, F[1] + gH * kk1 * inv,
                -(F[2] * kk0 + F[4] * kk1), -(F[3] * kk0 + F[5] * kk1),
                ov)

    for i in range(n):
        a0 = i / n
        da = 1.0 / n
        if spec.stepper == "rk23":
            d = rhs(x0, x1, k0, k1, a0)
            e = rhs(x0 + 0.5 * h * d[0], x1 + 0.5 * h * d[1],
                    k0 + 0.5 * h * d[2], k1 + 0.5 * h * d[3],
                    a0 + 0.5 * da)
            g = rhs(x0 + 0.75 * h * e[0], x1 + 0.75 * h * e[1],
                    k0 + 0.75 * h * e[2], k1 + 0.75 * h * e[3],
                    a0 + 0.75 * da)
            c = h / 9.0
            x0 = x0 + c * (2.0 * d[0] + 3.0 * e[0] + 4.0 * g[0])
            x1 = x1 + c * (2.0 * d[1] + 3.0 * e[1] + 4.0 * g[1])
            k0 = k0 + c * (2.0 * d[2] + 3.0 * e[2] + 4.0 * g[2])
            k1 = k1 + c * (2.0 * d[3] + 3.0 * e[3] + 4.0 * g[3])
            ov_tot = jnp.maximum(ov_tot,
                                 jnp.maximum(d[4], jnp.maximum(e[4], g[4])))
        elif spec.stepper == "rk4":
            d = rhs(x0, x1, k0, k1, a0)
            e = rhs(x0 + 0.5 * h * d[0], x1 + 0.5 * h * d[1],
                    k0 + 0.5 * h * d[2], k1 + 0.5 * h * d[3],
                    a0 + 0.5 * da)
            g = rhs(x0 + 0.5 * h * e[0], x1 + 0.5 * h * e[1],
                    k0 + 0.5 * h * e[2], k1 + 0.5 * h * e[3],
                    a0 + 0.5 * da)
            q = rhs(x0 + h * g[0], x1 + h * g[1],
                    k0 + h * g[2], k1 + h * g[3], a0 + da)
            c = h / 6.0
            x0 = x0 + c * (d[0] + 2.0 * (e[0] + g[0]) + q[0])
            x1 = x1 + c * (d[1] + 2.0 * (e[1] + g[1]) + q[1])
            k0 = k0 + c * (d[2] + 2.0 * (e[2] + g[2]) + q[2])
            k1 = k1 + c * (d[3] + 2.0 * (e[3] + g[3]) + q[3])
            ov_tot = jnp.maximum(
                ov_tot, jnp.maximum(jnp.maximum(d[4], e[4]),
                                    jnp.maximum(g[4], q[4])))
        elif spec.stepper == "symplectic":
            om = jnp.sqrt(f2 + gH * (k0 * k0 + k1 * k1))
            cinv = 0.5 * h * gH / om
            x0 = x0 + cinv * k0
            x1 = x1 + cinv * k1
            F, ov = _eval_fields(pw1, pw2, x0, x1, a0 + 0.5 * da,
                                 oi, oj, spec)
            k0n = k0 - h * (F[2] * k0 + F[4] * k1)
            k1n = k1 - h * (F[3] * k0 + F[5] * k1)
            x0 = x0 + h * F[0]
            x1 = x1 + h * F[1]
            k0, k1 = k0n, k1n
            om = jnp.sqrt(f2 + gH * (k0 * k0 + k1 * k1))
            cinv = 0.5 * h * gH / om
            x0 = x0 + cinv * k0
            x1 = x1 + cinv * k1
            ov_tot = jnp.maximum(ov_tot, ov)
        else:
            raise ValueError(f"unknown stepper {spec.stepper!r}")
    return x0, x1, k0, k1, ov_tot


# ---------------------------------------------------------------------------
# XLA reference implementation (CPU fallback, test oracle, VJP backward)
# ---------------------------------------------------------------------------

def march_reference(pw1, pw2, xk, oi, oj, sub_dt, spec: MarchSpec):
    """Pure-XLA fused march over all packets at once. pw*: (K, Np) (or
    (Np, K) when spec.tiles_transposed); xk (4, Np) = [x, y, kx, ky];
    returns (xk_out (4, Np), overflow (Np,) int32).

    combined_gather: pw1 carries BOTH snapshots stacked on the K axis
    ((2K, Np) / (Np, 2K)); pw2 is ignored (pass any array)."""
    if spec.grad_from_interp and spec.nf != 2:
        raise ValueError("grad_from_interp windows hold (u, v): nf must "
                         f"be 2, got {spec.nf}")
    if spec.combined_gather:
        w = pw1.T if spec.tiles_transposed else pw1          # (2K, Np)
        p = w.reshape(2, spec.nf, spec.SW, spec.SW, -1)
        p1, p2 = p[0], p[1]
    else:
        if spec.tiles_transposed:
            pw1 = pw1.T
            pw2 = pw2.T
        p1 = pw1.reshape(spec.nf, spec.SW, spec.SW, -1)
        p2 = pw2.reshape(spec.nf, spec.SW, spec.SW, -1)
    r = _march_core(p1, p2, xk[0], xk[1], xk[2], xk[3], oi, oj,
                    sub_dt, spec)
    return jnp.stack(r[:4]), r[4]


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

def _march_kernel(dt_ref, *refs, spec: MarchSpec):
    dt = dt_ref[0, 0]
    if spec.combined_gather:
        pwc_ref, xk_ref, o_ref, out_ref, ov_ref = refs
        pwc = pwc_ref[:].T if spec.tiles_transposed else pwc_ref[:]
        B = pwc.shape[-1]
        p = pwc.reshape(2, spec.nf, spec.SW, spec.SW, B)
        p1, p2 = p[0], p[1]
    else:
        pw1_ref, pw2_ref, xk_ref, o_ref, out_ref, ov_ref = refs
        if spec.tiles_transposed:
            p1 = pw1_ref[:].T
            p2 = pw2_ref[:].T
        else:
            p1 = pw1_ref[:]
            p2 = pw2_ref[:]
        B = p1.shape[-1]
        p1 = p1.reshape(spec.nf, spec.SW, spec.SW, B)
        p2 = p2.reshape(spec.nf, spec.SW, spec.SW, B)
    xk = xk_ref[:]
    o = o_ref[:]
    x0, x1, k0, k1, ov = _march_core(p1, p2, xk[0], xk[1], xk[2], xk[3],
                                     o[0], o[1], dt, spec)
    out_ref[:] = jnp.stack([x0, x1, k0, k1])
    ov_ref[:] = ov[None]


def march_pallas(pw1, pw2, xk, oi, oj, sub_dt, spec: MarchSpec):
    """Pallas-compiled fused march. Packet count must be a multiple of
    spec.block (pad with pad_packet_axis). Inputs as march_reference;
    under combined_gather only pw1 (both snapshots, 2K rows) is fed to
    the kernel."""
    Np = xk.shape[-1]
    B = spec.block
    assert Np % B == 0, (Np, B)
    nblk = Np // B
    K = 2 * spec.K if spec.combined_gather else spec.K
    dt_arr = jnp.asarray(sub_dt, xk.dtype).reshape(1, 1)
    o = jnp.stack([oi, oj]).astype(jnp.int32)

    if spec.tiles_transposed:
        pw_spec = pl.BlockSpec((B, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    else:
        pw_spec = pl.BlockSpec((K, B), lambda i: (0, i),
                               memory_space=pltpu.VMEM)

    pw_specs = [pw_spec] if spec.combined_gather else [pw_spec, pw_spec]
    pw_args = (pw1,) if spec.combined_gather else (pw1, pw2)
    out, ov = pl.pallas_call(
        functools.partial(_march_kernel, spec=spec),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            *pw_specs,
            pl.BlockSpec((4, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((4, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((4, Np), xk.dtype),
            jax.ShapeDtypeStruct((1, Np), jnp.int32),
        ),
        interpret=spec.interpret,
    )(dt_arr, *pw_args, xk, o)
    return out, ov[0]


# ---------------------------------------------------------------------------
# custom_vjp wrapper: Pallas forward, XLA-reference backward
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_march(pw1, pw2, xk, oi, oj, sub_dt, spec: MarchSpec,
                use_pallas: bool = True):
    """Differentiable fused march. Forward runs the Pallas kernel
    (use_pallas=True) or the XLA reference; backward always
    differentiates the XLA reference (same arithmetic, clean shapes:
    the cotangent w.r.t. the packet windows is dense per-packet weight
    outer products — no scatter, no pathological layouts)."""
    if use_pallas:
        return march_pallas(pw1, pw2, xk, oi, oj, sub_dt, spec)
    return march_reference(pw1, pw2, xk, oi, oj, sub_dt, spec)


def _fused_march_fwd(pw1, pw2, xk, oi, oj, sub_dt, spec, use_pallas):
    out = fused_march(pw1, pw2, xk, oi, oj, sub_dt, spec, use_pallas)
    return out, (pw1, pw2, xk, oi, oj, sub_dt)


def _fused_march_bwd(spec, use_pallas, res, ct):
    pw1, pw2, xk, oi, oj, sub_dt = res
    ct_xk, _ = ct  # overflow output is integer — no cotangent

    def f(pw1_, pw2_, xk_, dt_):
        return march_reference(pw1_, pw2_, xk_, oi, oj, dt_, spec)[0]

    _, vjp = jax.vjp(f, pw1, pw2, xk, sub_dt)
    g_pw1, g_pw2, g_xk, g_dt = vjp(ct_xk)
    zi = np.zeros(oi.shape, jax.dtypes.float0)
    zj = np.zeros(oj.shape, jax.dtypes.float0)
    return g_pw1, g_pw2, g_xk, zi, zj, g_dt


fused_march.defvjp(_fused_march_fwd, _fused_march_bwd)
