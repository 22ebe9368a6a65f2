"""Find packet3's ~130us/packet constant: incremental kernels from
outputs-init to the full body, identical launch config, fresh inputs.

K0 out-init only
K1 +inv_d +sgn
K2 +while loop, 2 iterations of REAL phase-1 code (meta/bounds loads+slabs)
K3 +phase-2 scalar steering
K4 +phase-3 pl.when drain region (never taken)
K5 full packet3 body, forced ~2 iterations (tmax=0 any-hit null)

Usage: python tools/probe_overhead2.py
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from evplp_tpu.trace.intersect import TRI_EPS  # noqa: E402

LANES = 128
ROWS = 64
NPACK = 2
BLOCK = ROWS * NPACK
QCAP = 8
QSTRIDE = QCAP + 1
STACK_DEPTH = 64


def make_kernel(level: int, nnodes: int, nrows_tri: int):
    def kernel(bounds_ref, meta_ref, tri_ref,
               ox, oy, oz, dx, dy, dz, tmin_ref, tmax_ref,
               t_out, prim_out, u_out, v_out,
               stack_ref, qrow_ref, qcnt_ref, sgn_ref, hit_ref,
               ivx, ivy, ivz):
        t_out[:] = tmax_ref[:]
        prim_out[:] = jnp.where(tmax_ref[:] <= tmin_ref[:], 0, -1)
        u_out[:] = jnp.zeros_like(u_out)
        v_out[:] = jnp.zeros_like(v_out)
        if level < 1:
            return
        big = jnp.float32(3.0e38)
        for d_ref, iv_ref in ((dx, ivx), (dy, ivy), (dz, ivz)):
            dv = d_ref[:]
            iv_ref[:] = jnp.where(jnp.abs(dv) > 1e-20, 1.0 / dv,
                                  jnp.where(dv >= 0.0, big, -big))
        for k in range(NPACK):
            sl = slice(k * ROWS, (k + 1) * ROWS)
            sgn_ref[3 * k + 0] = (jnp.sum(dx[sl]) >= 0.0).astype(jnp.int32)
            sgn_ref[3 * k + 1] = (jnp.sum(dy[sl]) >= 0.0).astype(jnp.int32)
            sgn_ref[3 * k + 2] = (jnp.sum(dz[sl]) >= 0.0).astype(jnp.int32)
        if level < 2:
            return

        def slab(k, nb):
            sl = slice(k * ROWS, (k + 1) * ROWS)
            t0x = (nb[0] - ox[sl]) * ivx[sl]
            t1x = (nb[3] - ox[sl]) * ivx[sl]
            t0y = (nb[1] - oy[sl]) * ivy[sl]
            t1y = (nb[4] - oy[sl]) * ivy[sl]
            t0z = (nb[2] - oz[sl]) * ivz[sl]
            t1z = (nb[5] - oz[sl]) * ivz[sl]
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            want = (tn <= tf) & (tf >= 0.0) & (tn <= t_out[sl]) \
                & (prim_out[sl] < 0)
            return jnp.any(want)

        def drain(k, qn):
            sl = slice(k * ROWS, (k + 1) * ROWS)
            oxs, oys, ozs = ox[sl], oy[sl], oz[sl]
            dxs, dys, dzs = dx[sl], dy[sl], dz[sl]
            tmin = tmin_ref[sl]

            def entry(q, carry):
                best_t, best_p = carry
                row = qrow_ref[k * QSTRIDE + q]
                count = qcnt_ref[k * QSTRIDE + q]
                blk = tri_ref[row, :]
                for j in range(8):
                    b = j * 16
                    v0x_, v0y_, v0z_ = blk[b], blk[b + 1], blk[b + 2]
                    e1x_, e1y_, e1z_ = blk[b + 3], blk[b + 4], blk[b + 5]
                    e2x_, e2y_, e2z_ = blk[b + 6], blk[b + 7], blk[b + 8]
                    px = dys * e2z_ - dzs * e2y_
                    py = dzs * e2x_ - dxs * e2z_
                    pz = dxs * e2y_ - dys * e2x_
                    det = e1x_ * px + e1y_ * py + e1z_ * pz
                    inv_det = jnp.where(jnp.abs(det) > TRI_EPS,
                                        1.0 / det, 0.0)
                    tx = oxs - v0x_
                    ty = oys - v0y_
                    tz = ozs - v0z_
                    uu = (tx * px + ty * py + tz * pz) * inv_det
                    qx = ty * e1z_ - tz * e1y_
                    qy = tz * e1x_ - tx * e1z_
                    qz = tx * e1y_ - ty * e1x_
                    vv = (dxs * qx + dys * qy + dzs * qz) * inv_det
                    tt = (e2x_ * qx + e2y_ * qy + e2z_ * qz) * inv_det
                    ok = ((jnp.abs(det) > TRI_EPS) & (uu >= 0.0)
                          & (vv >= 0.0) & (uu + vv <= 1.0)
                          & (tt > tmin) & (tt < best_t) & (j < count))
                    best_t = jnp.where(ok, tt, best_t)
                    best_p = jnp.where(ok, (row * 8 + j), best_p)
                return best_t, best_p

            best_t, best_p = jax.lax.fori_loop(
                0, qn, entry, (t_out[sl], prim_out[sl]))
            prim_out[sl] = best_p
            t_out[sl] = best_t
            return jnp.int32(0)

        def cond(state):
            i, curs, sps, qns = state
            return i < 2        # force exactly 2 iterations

        def body(state):
            i, curs, sps, qns = state
            curs = list(curs)
            sps = list(sps)
            qns = list(qns)
            tests = []
            for k in range(NPACK):
                active = curs[k] >= 0
                node = jnp.maximum(curs[k], 0)
                mrow = meta_ref[node, :]
                left = jnp.minimum(node + 1, nnodes - 1)
                right = jnp.clip(mrow[2], 0, nnodes - 1)
                axis = mrow[3]
                ml = meta_ref[left, :]
                mr = meta_ref[right, :]
                want_l = slab(k, bounds_ref[left, :]) & active
                want_r = slab(k, bounds_ref[right, :]) & active
                tests.append((left, right, axis, ml, mr, want_l, want_r))

            if level >= 3:
                for k in range(NPACK):
                    left, right, axis, ml, mr, want_l, want_r = tests[k]
                    l_leaf = ml[0] > 0
                    r_leaf = mr[0] > 0
                    enq_l = want_l & l_leaf
                    slot_l = k * QSTRIDE + jnp.where(enq_l, qns[k], QCAP)
                    qrow_ref[slot_l] = jnp.clip(ml[1], 0, nrows_tri - 1)
                    qcnt_ref[slot_l] = ml[0]
                    qn = qns[k] + enq_l.astype(jnp.int32)
                    enq_r = want_r & r_leaf
                    slot_r = k * QSTRIDE + jnp.where(enq_r, qn, QCAP)
                    qrow_ref[slot_r] = jnp.clip(mr[1], 0, nrows_tri - 1)
                    qcnt_ref[slot_r] = mr[0]
                    qn = qn + enq_r.astype(jnp.int32)
                    wl = want_l & jnp.logical_not(l_leaf)
                    wr = want_r & jnp.logical_not(r_leaf)
                    pos_dir = jnp.where(
                        axis == 0, sgn_ref[3 * k],
                        jnp.where(axis == 1, sgn_ref[3 * k + 1],
                                  sgn_ref[3 * k + 2])) > 0
                    first = jnp.where(pos_dir, left, right)
                    second = jnp.where(pos_dir, right, left)
                    wf = jnp.where(pos_dir, wl, wr)
                    ws = jnp.where(pos_dir, wr, wl)
                    cur = jnp.where(wf, first, jnp.where(ws, second, -1))
                    push = wf & ws
                    sp = sps[k]
                    stack_ref[k * STACK_DEPTH +
                              jnp.where(push, sp, STACK_DEPTH - 1)] = second
                    sp = sp + push.astype(jnp.int32)
                    top = stack_ref[k * STACK_DEPTH + jnp.maximum(sp - 1, 0)]
                    need_pop = (cur < 0) & (sp > 0)
                    cur = jnp.where(need_pop, top, cur)
                    sp = sp - need_pop.astype(jnp.int32)
                    curs[k] = cur
                    sps[k] = sp
                    qns[k] = qn

            if level >= 4:
                for k in range(NPACK):
                    done = (curs[k] < 0) & (sps[k] <= 0)
                    do_drain = (qns[k] >= QCAP - 1) | (done & (qns[k] > 0))

                    @pl.when(do_drain)
                    def _(k=k, qn=qns[k]):
                        drain(k, qn)
                        hit_ref[k] = jnp.all(
                            prim_out[slice(k * ROWS, (k + 1) * ROWS)] >= 0
                        ).astype(jnp.int32)

                    qns[k] = jnp.where(do_drain, 0, qns[k])
                    stop = do_drain & (hit_ref[k] > 0)
                    curs[k] = jnp.where(stop, -1, curs[k])
                    sps[k] = jnp.where(stop, 0, sps[k])
                    qns[k] = jnp.where(stop, 0, qns[k])

            return (i + 1, tuple(curs), tuple(sps), tuple(qns))

        zero = jnp.int32(0)
        init = (jnp.int32(0), tuple(zero for _ in range(NPACK)),
                tuple(zero for _ in range(NPACK)),
                tuple(zero for _ in range(NPACK)))
        jax.lax.while_loop(cond, body, init)

    return kernel


def main():
    n = 1 << 20
    total_rows = n // LANES
    grid = total_rows // BLOCK
    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    nnodes, nrows_tri = 36775, 12752

    bounds = jnp.asarray(rng.normal(size=(nnodes, 8)).astype(np.float32))
    meta = jnp.asarray(rng.integers(0, 8, size=(nnodes, 4)).astype(np.int32))
    tri = jnp.asarray(rng.normal(size=(nrows_tri, 128)).astype(np.float32))

    ray_spec = pl.BlockSpec((BLOCK, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32),
                 jax.ShapeDtypeStruct((total_rows, LANES), jnp.int32),
                 jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32),
                 jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32)]

    def fresh():
        return [jnp.asarray(rng.normal(size=(total_rows, LANES))
                            .astype(np.float32)) for _ in range(8)]

    for level in range(5):
        f = jax.jit(lambda *a, lv=level: pl.pallas_call(
            make_kernel(lv, nnodes, nrows_tri), grid=(grid,),
            in_specs=[full] * 3 + [ray_spec] * 8,
            out_specs=[ray_spec] * 4, out_shape=out_shape,
            scratch_shapes=[
                pltpu.SMEM((NPACK * STACK_DEPTH,), jnp.int32),
                pltpu.SMEM((NPACK * QSTRIDE,), jnp.int32),
                pltpu.SMEM((NPACK * QSTRIDE,), jnp.int32),
                pltpu.SMEM((NPACK * 3,), jnp.int32),
                pltpu.SMEM((NPACK,), jnp.int32),
                pltpu.VMEM((BLOCK, LANES), jnp.float32),
                pltpu.VMEM((BLOCK, LANES), jnp.float32),
                pltpu.VMEM((BLOCK, LANES), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(bounds, meta, tri, *a))
        jax.block_until_ready(f(*fresh()))
        R = 6
        ins = [fresh() for _ in range(R)]
        t0 = time.perf_counter()
        outs = [f(*i) for i in ins]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / R
        print(f"level {level}: {dt*1e3:7.2f} ms/call  "
              f"{dt/grid*1e6:6.1f} us/step", flush=True)


if __name__ == "__main__":
    main()
