"""Dissect packet3's ~200us/grid-step fixed cost with stripped kernels:

  K0  outputs-init only (measures block DMA in/out + launch)
  K1  K0 + inv_d scratch + per-packet sign reductions (prologue vector)
  K2  K1 + a 1-iteration while loop (loop entry/exit)

Usage: python tools/probe_overhead.py
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

LANES = 128
ROWS = 64
NPACK = 2
BLOCK = ROWS * NPACK


def k0(ox, oy, oz, dx, dy, dz, tmin, tmax, t, prim, u, v, ivx, ivy, ivz):
    t[:] = tmax[:]
    prim[:] = jnp.full_like(prim, -1)
    u[:] = jnp.zeros_like(u)
    v[:] = jnp.zeros_like(v)


def k1(ox, oy, oz, dx, dy, dz, tmin, tmax, t, prim, u, v, ivx, ivy, ivz,
       sgn=None):
    t[:] = tmax[:]
    prim[:] = jnp.full_like(prim, -1)
    u[:] = jnp.zeros_like(u)
    v[:] = jnp.zeros_like(v)
    big = jnp.float32(3.0e38)
    for d_ref, iv_ref in ((dx, ivx), (dy, ivy), (dz, ivz)):
        dv = d_ref[:]
        iv_ref[:] = jnp.where(jnp.abs(dv) > 1e-20, 1.0 / dv,
                              jnp.where(dv >= 0.0, big, -big))
    if sgn is not None:
        for k in range(NPACK):
            sl = slice(k * ROWS, (k + 1) * ROWS)
            sgn[3 * k + 0] = (jnp.sum(dx[sl]) >= 0.0).astype(jnp.int32)
            sgn[3 * k + 1] = (jnp.sum(dy[sl]) >= 0.0).astype(jnp.int32)
            sgn[3 * k + 2] = (jnp.sum(dz[sl]) >= 0.0).astype(jnp.int32)


def k2(ox, oy, oz, dx, dy, dz, tmin, tmax, t, prim, u, v, ivx, ivy, ivz,
       sgn, *unused):
    k1(ox, oy, oz, dx, dy, dz, tmin, tmax, t, prim, u, v, ivx, ivy, ivz, sgn)

    def cond(s):
        return s[0] >= 0

    def body(s):
        # minimal per-iteration shape: one scalar read + one vector any
        w = jnp.any(ivx[0:ROWS] > 0.0)
        return (jnp.where(w, s[0] - 1, -1),)

    jax.lax.while_loop(cond, body, (jnp.int32(0),))


def launch(kern, n_rays, with_sgn):
    total_rows = n_rays // LANES
    grid = total_rows // BLOCK
    ray_spec = pl.BlockSpec((BLOCK, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32),
                 jax.ShapeDtypeStruct((total_rows, LANES), jnp.int32),
                 jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32),
                 jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32)]
    scratch = [pltpu.VMEM((BLOCK, LANES), jnp.float32)] * 3
    if with_sgn:
        scratch = scratch + [pltpu.SMEM((NPACK * 3,), jnp.int32)]
    if with_sgn == "big":
        scratch = scratch + [pltpu.VMEM((13000, 128), jnp.float32),
                             pltpu.VMEM((36775, 8), jnp.float32)]

    @jax.jit
    def f(*args):
        return pl.pallas_call(
            kern, grid=(grid,), in_specs=[ray_spec] * 8,
            out_specs=[ray_spec] * 4, out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*args)
    return f, grid


def main():
    n = 1 << 20
    rows_total = n // LANES
    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))

    def fresh():
        return [jnp.asarray(rng.normal(size=(rows_total, LANES))
                            .astype(np.float32)) for _ in range(8)]

    for name, kern, with_sgn in (("K0 out-init ", k0, False),
                                 ("K1 +prologue", k1, False),
                                 ("K1 +sgn     ", k1, True),
                                 ("K2 +loop    ", k2, True),
                                 ("K3 +bigscr  ", k2, "big")):
        if name == "K1 +sgn     ":
            def kern(*a):  # noqa: F811
                return k1(*a[:-1], sgn=a[-1])
        f, grid = launch(kern, n, with_sgn)
        jax.block_until_ready(f(*fresh()))
        R = 6
        ins = [fresh() for _ in range(R)]
        t0 = time.perf_counter()
        outs = [f(*i) for i in ins]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / R
        print(f"{name}: {dt*1e3:7.2f} ms/call  {dt/grid*1e6:6.1f} us/step",
              flush=True)


if __name__ == "__main__":
    main()
