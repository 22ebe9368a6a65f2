"""Pallas packet BVH traversal, v6 — fused grid.

packet3 runs one Pallas grid step per ray block; measured on v5e, each grid
step carries ~200-265 us of machinery (block bookkeeping, pipeline
flushes) that dwarfs the actual traversal for coherent workloads (a shadow
packet needs ~30 node visits ~= a few us of vector work).

v6 launches ONCE (grid=1) and loops over ray blocks INSIDE the kernel with
explicit async copies: scene arrays are DMA'd to VMEM scratch at entry,
then a fori_loop drains ray blocks HBM->VMEM, traverses (same ordered
two-child descent + SMEM leaf queue as packet3), and writes hits back
VMEM->HBM.  The per-block cost is two ~us DMAs instead of the grid glue.

Same packed layout as packet3 (accel/bvh.py pk_*); multi-row leaves (rpl)
supported.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from evplp_tpu.trace.intersect import TRI_EPS

LANES = 128
SLOT = 16                # lanes per triangle slot
LEAF = 8                 # triangles per leaf row
ROWS = 64                # rows per packet
NPACK = 2                # packets per block
QCAP = 8                 # leaf-queue capacity per packet
QSTRIDE = QCAP + 1       # + one sacrificial dummy slot
STACK_DEPTH = 64

_COMPILED = True


def set_interpret(interpret: bool) -> None:
    global _COMPILED
    _COMPILED = not interpret


def _kernel(any_hit: bool, npack: int, rows: int, rpl: int, nblocks: int):
    block_rows = rows * npack

    def kernel(bounds_hbm, meta_hbm, tri_hbm,
               ox_hbm, oy_hbm, oz_hbm, dx_hbm, dy_hbm, dz_hbm,
               tmin_hbm, tmax_hbm,
               t_hbm, prim_hbm, u_hbm, v_hbm,
               bounds_s, meta_s, tri_s,
               ox, oy, oz, dx, dy, dz, tmin_s, tmax_s,
               t_s, prim_s, u_s, v_s,
               ivx, ivy, ivz,
               stack_ref, qrow_ref, qcnt_ref, sgn_ref, hit_ref,
               sem_in, sem_out):
        # ---- scene in (once) ----
        for src, dst in ((bounds_hbm, bounds_s), (meta_hbm, meta_s),
                         (tri_hbm, tri_s)):
            cp = pltpu.make_async_copy(src, dst, sem_in)
            cp.start()
            cp.wait()

        def slab(k, nb):
            sl = slice(k * rows, (k + 1) * rows)
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
            want = (tn <= tf) & (tf >= 0.0) & (tn <= t_s[sl])
            if any_hit:
                want = want & (prim_s[sl] < 0)
            return jnp.any(want)

        def drain(k, qn):
            sl = slice(k * rows, (k + 1) * rows)
            oxs, oys, ozs = ox[sl], oy[sl], oz[sl]
            dxs, dys, dzs = dx[sl], dy[sl], dz[sl]
            tmin = tmin_s[sl]

            def entry(q, carry):
                best_t, best_p, best_u, best_v = carry
                row = qrow_ref[k * QSTRIDE + q]
                count = qcnt_ref[k * QSTRIDE + q]
                for rr in range(rpl):
                    blk = tri_s[row + rr, :]
                    for j in range(LEAF):
                        b = j * SLOT
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
                              & (tt > tmin) & (tt < best_t)
                              & (rr * LEAF + j < count))
                        slot_id = (row + rr) * LEAF + j
                        if any_hit:
                            best_p = jnp.where(ok & (best_p < 0), slot_id,
                                               best_p)
                        else:
                            best_t = jnp.where(ok, tt, best_t)
                            best_p = jnp.where(ok, slot_id, best_p)
                            best_u = jnp.where(ok, uu, best_u)
                            best_v = jnp.where(ok, vv, best_v)
                return best_t, best_p, best_u, best_v

            init = (t_s[sl], prim_s[sl], u_s[sl], v_s[sl])
            best_t, best_p, best_u, best_v = jax.lax.fori_loop(
                0, qn, entry, init)
            prim_s[sl] = best_p
            if not any_hit:
                t_s[sl] = best_t
                u_s[sl] = best_u
                v_s[sl] = best_v
            return jnp.int32(0)

        def cond(state):
            curs, sps, qns = state
            alive = False
            for k in range(npack):
                alive = alive | (curs[k] >= 0) | (sps[k] > 0) | (qns[k] > 0)
            return alive

        def body(state):
            curs, sps, qns = state
            curs = list(curs)
            sps = list(sps)
            qns = list(qns)

            tests = []
            for k in range(npack):
                active = curs[k] >= 0
                node = jnp.maximum(curs[k], 0)
                mrow = meta_s[node, :]
                left = node + 1
                right = mrow[2]
                axis = mrow[3]
                ml = meta_s[left, :]
                mr = meta_s[jnp.maximum(right, 0), :]
                want_l = slab(k, bounds_s[left, :]) & active
                want_r = slab(k, bounds_s[jnp.maximum(right, 0), :]) & active
                tests.append((left, right, axis, ml, mr, want_l, want_r))

            for k in range(npack):
                left, right, axis, ml, mr, want_l, want_r = tests[k]
                l_leaf = ml[0] > 0
                r_leaf = mr[0] > 0

                enq_l = want_l & l_leaf
                slot_l = k * QSTRIDE + jnp.where(enq_l, qns[k], QCAP)
                qrow_ref[slot_l] = ml[1]
                qcnt_ref[slot_l] = ml[0]
                qn = qns[k] + enq_l.astype(jnp.int32)

                enq_r = want_r & r_leaf
                slot_r = k * QSTRIDE + jnp.where(enq_r, qn, QCAP)
                qrow_ref[slot_r] = mr[1]
                qcnt_ref[slot_r] = mr[0]
                qn = qn + enq_r.astype(jnp.int32)

                wl = want_l & jnp.logical_not(l_leaf)
                wr = want_r & jnp.logical_not(r_leaf)
                s0 = sgn_ref[3 * k + 0]
                s1 = sgn_ref[3 * k + 1]
                s2 = sgn_ref[3 * k + 2]
                pos_dir = jnp.where(axis == 0, s0,
                                    jnp.where(axis == 1, s1, s2)) > 0
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

            for k in range(npack):
                done = (curs[k] < 0) & (sps[k] <= 0)
                do_drain = (qns[k] >= QCAP - 1) | (done & (qns[k] > 0))

                @pl.when(do_drain)
                def _(k=k, qn=qns[k]):
                    drain(k, qn)
                    if any_hit:
                        sl = slice(k * rows, (k + 1) * rows)
                        hit_ref[k] = jnp.all(prim_s[sl] >= 0).astype(
                            jnp.int32)

                qns[k] = jnp.where(do_drain, 0, qns[k])
                if any_hit:
                    stop = do_drain & (hit_ref[k] > 0)
                    curs[k] = jnp.where(stop, -1, curs[k])
                    sps[k] = jnp.where(stop, 0, sps[k])
                    qns[k] = jnp.where(stop, 0, qns[k])

            return (tuple(curs), tuple(sps), tuple(qns))

        # ---- block loop ----
        def block_step(blk, _):
            off = blk * block_rows
            ds = pl.ds(off, block_rows)
            for src, dst in ((ox_hbm, ox), (oy_hbm, oy), (oz_hbm, oz),
                             (dx_hbm, dx), (dy_hbm, dy), (dz_hbm, dz),
                             (tmin_hbm, tmin_s), (tmax_hbm, tmax_s)):
                cp = pltpu.make_async_copy(src.at[ds, :], dst, sem_in)
                cp.start()
                cp.wait()

            t_s[:] = tmax_s[:]
            if any_hit:
                prim_s[:] = jnp.where(tmax_s[:] <= tmin_s[:], 0, -1)
            else:
                prim_s[:] = jnp.full_like(prim_s, -1)
            u_s[:] = jnp.zeros_like(u_s)
            v_s[:] = jnp.zeros_like(v_s)

            big = jnp.float32(3.0e38)
            for d_ref, iv_ref in ((dx, ivx), (dy, ivy), (dz, ivz)):
                dv = d_ref[:]
                iv_ref[:] = jnp.where(jnp.abs(dv) > 1e-20, 1.0 / dv,
                                      jnp.where(dv >= 0.0, big, -big))

            for k in range(npack):
                sl = slice(k * rows, (k + 1) * rows)
                sgn_ref[3 * k + 0] = (jnp.sum(dx[sl]) >= 0.0).astype(
                    jnp.int32)
                sgn_ref[3 * k + 1] = (jnp.sum(dy[sl]) >= 0.0).astype(
                    jnp.int32)
                sgn_ref[3 * k + 2] = (jnp.sum(dz[sl]) >= 0.0).astype(
                    jnp.int32)

            zero = jnp.int32(0)
            init = (tuple(zero for _ in range(npack)),
                    tuple(zero for _ in range(npack)),
                    tuple(zero for _ in range(npack)))
            jax.lax.while_loop(cond, body, init)

            for src, dst in ((t_s, t_hbm), (prim_s, prim_hbm),
                             (u_s, u_hbm), (v_s, v_hbm)):
                cp = pltpu.make_async_copy(src, dst.at[ds, :], sem_out)
                cp.start()
                cp.wait()
            return 0

        jax.lax.fori_loop(0, nblocks, block_step, 0)

    return kernel


@partial(jax.jit, static_argnames=("any_hit", "rows", "npack", "rpl"))
def packet6_trace(tri_rows, meta, bounds, prim_map, o, d, t_min, t_max,
                  any_hit: bool = False, rows: int = ROWS,
                  npack: int = NPACK, rpl: int = 1):
    """Traverse with the packed layout, fused-grid version. Returns
    (t, prim, u, v) with prim mapped to original triangle ids (-1 = miss)."""
    r = o.shape[0]
    block_rows = rows * npack
    packet = block_rows * LANES
    pad = (-r) % packet
    total_rows = (r + pad) // LANES
    nblocks = total_rows // block_rows

    def prep(x, fill=0.0):
        x = jnp.pad(x, (0, pad), constant_values=fill)
        return x.reshape(total_rows, LANES)

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    args = (prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2]),
            prep(d[:, 0], 1.0), prep(d[:, 1], 1.0), prep(d[:, 2], 1.0),
            prep(t_min, 1.0), prep(t_max, 0.0))

    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    out_shape = [
        jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((total_rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32),
    ]
    rb = lambda dt_: pltpu.VMEM((block_rows, LANES), dt_)
    t, slot, u, v = pl.pallas_call(
        _kernel(any_hit, npack, rows, rpl, nblocks),
        grid=(1,),
        in_specs=[any_spec] * 11,
        out_specs=[any_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM(bounds.shape, bounds.dtype),
            pltpu.VMEM(meta.shape, meta.dtype),
            pltpu.VMEM(tri_rows.shape, tri_rows.dtype),
            rb(jnp.float32), rb(jnp.float32), rb(jnp.float32),
            rb(jnp.float32), rb(jnp.float32), rb(jnp.float32),
            rb(jnp.float32), rb(jnp.float32),
            rb(jnp.float32), rb(jnp.int32), rb(jnp.float32), rb(jnp.float32),
            rb(jnp.float32), rb(jnp.float32), rb(jnp.float32),
            pltpu.SMEM((npack * STACK_DEPTH,), jnp.int32),
            pltpu.SMEM((npack * QSTRIDE,), jnp.int32),
            pltpu.SMEM((npack * QSTRIDE,), jnp.int32),
            pltpu.SMEM((npack * 3,), jnp.int32),
            pltpu.SMEM((npack,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=not _COMPILED,
    )(bounds, meta, tri_rows, *args)

    flat = lambda x: x.reshape(-1)[:r]
    slot = flat(slot)
    if prim_map is None:     # slot-ordered scene: slot IS the triangle id
        prim = slot
    else:
        prim = jnp.where(slot >= 0, prim_map[jnp.maximum(slot, 0)], -1)
    return flat(t), prim, flat(u), flat(v)
