"""Probe 2: margin-window BUILD strategies at 512^2 (see march_probe.py).

The fused march kernel wants, per flow step, a cell-window array W for
the new snapshot. Natural construction order is (K, ncells) with
K = nf*SW*SW contiguous rows (each row a shifted copy of a field); the
row-gather wants (ncells, K). Measures:
  1. natural build (K, ncells) = stack of shifted flattened copies;
  2. the same followed by transpose to (ncells, K);
  3. direct (ncells, K) build via stack(axis=-1);
  4. the existing interp.build_windows (order=2) for reference;
  5. conv_general_dilated_patches-based build.
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
import time

import jax
import jax.numpy as jnp

from swraytracing_tpu.ops.interp import build_windows

NX = 512
NF, SW = 6, 8  # order=2 stencil (S=6) + margin 1 each side


def timed(name, fn, *a, n=5):
    try:
        r = fn(*a)
        float(jnp.sum(jnp.ravel(r)[:1]))
    except Exception as e:
        print(f"{name:46s} FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*a)
        float(jnp.sum(jnp.ravel(r)[:1]))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:46s} {dt*1e3:9.2f} ms", flush=True)
    return dt


F = jax.jit(lambda k: jax.random.normal(k, (NF, NX, NX), jnp.float32))(
    jax.random.PRNGKey(0))


def _pad(F):
    p0 = SW - 1
    Fp = jnp.concatenate([F[:, :, NX - p0 // 2:], F,
                          F[:, :, :p0 - p0 // 2]], axis=2)
    Fp = jnp.concatenate([Fp[:, NX - p0 // 2:], Fp,
                          Fp[:, :p0 - p0 // 2]], axis=1)
    return Fp


def build_natural(F):
    Fp = _pad(F)
    rows = [Fp[f, sx:sx + NX, sy:sy + NX].reshape(-1)
            for f in range(NF) for sx in range(SW) for sy in range(SW)]
    return jnp.stack(rows, axis=0)          # (K, ncells)


def build_natural_T(F):
    return build_natural(F).T.copy()        # (ncells, K)


def build_direct(F):
    Fp = _pad(F)
    rows = [Fp[f, sx:sx + NX, sy:sy + NX].reshape(-1)
            for f in range(NF) for sx in range(SW) for sy in range(SW)]
    return jnp.stack(rows, axis=-1)         # (ncells, K)


def build_patches(F):
    Fp = _pad(F)[:, None]                   # (NF, 1, nxp, nyp) NCHW
    out = jax.vmap(lambda x: jax.lax.conv_general_dilated_patches(
        x[None], (SW, SW), (1, 1), "VALID"))(Fp)
    return out                              # (NF, 1, SW*SW, NX, NX)


from swraytracing_tpu.ops.pallas_window import pallas_transpose


def build_natural_pT(F):
    return pallas_transpose(build_natural(F))


timed("existing build_windows (216 cols)", jax.jit(build_windows), F)
timed("build natural (K, ncells)", jax.jit(build_natural), F)
timed("build natural + pallasT -> (ncells,K)", jax.jit(build_natural_pT), F)
timed("build natural + XLA T -> (ncells, K)", jax.jit(build_natural_T), F)
timed("build direct (ncells, K)", jax.jit(build_direct), F)
timed("conv patches build", jax.jit(build_patches), F)
