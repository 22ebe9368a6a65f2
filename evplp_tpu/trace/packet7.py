"""Pallas packet BVH traversal, v7 — two-level loop (tiny traversal body).

Round-2/3 archaeology: per-iteration cost tracks the STATIC instruction
count of the while body, not the executed work — unrolled drains (20x
code) dominated at ~200 us/step, rolled drains / fused rows / 4-wide /
fused-grid / leaf-size / packet-shape all left throughput flat because
every variant kept ~the same instructions-per-tree-level inside the loop
(the drain's 8-triangle test body alone is ~85% of packet3's loop body).

v7 splits the loop: an INNER while holds only slab tests + scalar
steering + SMEM leaf enqueues (the smallest possible body) and runs until
a packet's leaf queue nears capacity; the drain bodies live in the OUTER
loop and are fetched once per BURST of up to QCAP leaf rows instead of
once per traversal iteration.

Layout-compatible with packet3 (accel/bvh.py pk_*), incl. rpl>1 and the
sync_pack single-scalar want readout.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from evplp_tpu.trace.intersect import TRI_EPS

LANES = 128
SLOT = 9                 # lanes per triangle slot (v0, e1, e2)
LEAF = 14                # triangles per leaf row (14*9 = 126 lanes)
ROWS = 64                # rows per packet (rays = ROWS*LANES)
NPACK = 2                # interleaved packets per kernel instance
QCAP = 32                # leaf-queue capacity per packet (burst size)
QSTRIDE = QCAP + 1       # + one sacrificial dummy slot
STACK_DEPTH = 64
_PACK_BASE = 129         # lane-sum of a (1,128) 0/1 row is <= 128

_COMPILED = True


def set_interpret(interpret: bool) -> None:
    global _COMPILED
    _COMPILED = not interpret


def _kernel(any_hit: bool, npack: int, rows: int, rpl: int = 1):
    def kernel(bounds_ref, meta_ref, tri_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tmin_ref, tmax_ref,
               t_out, prim_out, u_out, v_out,
               stack_ref, qrow_ref, qcnt_ref, sgn_ref, hit_ref,
               ivx_ref, ivy_ref, ivz_ref,
               bounds_s, meta_s, tri_s, dma_sem):
        # scene residency: DMA'd into VMEM scratch once at grid step 0
        @pl.when(pl.program_id(0) == 0)
        def _():
            for src, dst in ((bounds_ref, bounds_s), (meta_ref, meta_s),
                             (tri_ref, tri_s)):
                cp = pltpu.make_async_copy(src, dst, dma_sem)
                cp.start()
                cp.wait()

        t_out[:] = tmax_ref[:]
        if any_hit:
            # pre-culled lanes (tmax <= tmin) start as fake hits so they
            # can't block the packet's early exit
            prim_out[:] = jnp.where(tmax_ref[:] <= tmin_ref[:], 0, -1)
        else:
            prim_out[:] = jnp.full_like(prim_out, -1)
        u_out[:] = jnp.zeros_like(u_out)
        v_out[:] = jnp.zeros_like(v_out)

        big = jnp.float32(3.0e38)
        for d_ref, iv_ref in ((dx_ref, ivx_ref), (dy_ref, ivy_ref),
                              (dz_ref, ivz_ref)):
            dv = d_ref[:]
            iv_ref[:] = jnp.where(jnp.abs(dv) > 1e-20, 1.0 / dv,
                                  jnp.where(dv >= 0.0, big, -big))

        for k in range(npack):
            sl = slice(k * rows, (k + 1) * rows)
            sgn_ref[3 * k + 0] = (jnp.sum(dx_ref[sl]) >= 0.0).astype(jnp.int32)
            sgn_ref[3 * k + 1] = (jnp.sum(dy_ref[sl]) >= 0.0).astype(jnp.int32)
            sgn_ref[3 * k + 2] = (jnp.sum(dz_ref[sl]) >= 0.0).astype(jnp.int32)

        def slab_row(k, nb):
            """(1, LANES) 0/1 sublane-reduced want row (vector domain)."""
            sl = slice(k * rows, (k + 1) * rows)
            ox, oy, oz = ox_ref[sl], oy_ref[sl], oz_ref[sl]
            ivx, ivy, ivz = ivx_ref[sl], ivy_ref[sl], ivz_ref[sl]
            t0x = (nb[0] - ox) * ivx
            t1x = (nb[3] - ox) * ivx
            t0y = (nb[1] - oy) * ivy
            t1y = (nb[4] - oy) * ivy
            t0z = (nb[2] - oz) * ivz
            t1z = (nb[5] - oz) * ivz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            want = (tn <= tf) & (tf >= 0.0) & (tn <= t_out[sl])
            if any_hit:
                want = want & (prim_out[sl] < 0)
            return jnp.any(want, axis=0, keepdims=True).astype(jnp.int32)

        def drain(k, qn):
            """Test all queued leaf rows of packet k (fori over the fill;
            this body lives OUTSIDE the traversal loop)."""
            sl = slice(k * rows, (k + 1) * rows)
            ox, oy, oz = ox_ref[sl], oy_ref[sl], oz_ref[sl]
            dx, dy, dz = dx_ref[sl], dy_ref[sl], dz_ref[sl]
            tmin = tmin_ref[sl]

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

                        px = dy * e2z_ - dz * e2y_
                        py = dz * e2x_ - dx * e2z_
                        pz = dx * e2y_ - dy * e2x_
                        det = e1x_ * px + e1y_ * py + e1z_ * pz
                        inv_det = jnp.where(jnp.abs(det) > TRI_EPS,
                                            1.0 / det, 0.0)
                        tx = ox - v0x_
                        ty = oy - v0y_
                        tz = oz - v0z_
                        uu = (tx * px + ty * py + tz * pz) * inv_det
                        qx = ty * e1z_ - tz * e1y_
                        qy = tz * e1x_ - tx * e1z_
                        qz = tx * e1y_ - ty * e1x_
                        vv = (dx * qx + dy * qy + dz * qz) * inv_det
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

            init = (t_out[sl], prim_out[sl], u_out[sl], v_out[sl])
            best_t, best_p, best_u, best_v = jax.lax.fori_loop(
                0, qn, entry, init)
            prim_out[sl] = best_p
            if not any_hit:
                t_out[sl] = best_t
                u_out[sl] = best_u
                v_out[sl] = best_v
            return jnp.int32(0)

        # ---------------- inner: traverse + enqueue only ----------------
        def inner_cond(state):
            curs, sps, qns = state
            alive = False
            room = True
            for k in range(npack):
                alive = alive | (curs[k] >= 0) | (sps[k] > 0)
                room = room & (qns[k] < QCAP - 1)
            return alive & room

        def inner_body(state):
            curs, sps, qns = state
            curs = list(curs)
            sps = list(sps)
            qns = list(qns)

            tests = []
            packed = None
            for k in range(npack):
                active = curs[k] >= 0
                node = jnp.maximum(curs[k], 0)
                mrow = meta_s[node, :]
                left = node + 1
                right = mrow[2]
                axis = mrow[3]
                ml = meta_s[left, :]
                mr = meta_s[jnp.maximum(right, 0), :]
                wl = slab_row(k, bounds_s[left, :])
                wr = slab_row(k, bounds_s[jnp.maximum(right, 0), :])
                part = (wl * (_PACK_BASE ** (2 * k))
                        + wr * (_PACK_BASE ** (2 * k + 1)))
                packed = part if packed is None else packed + part
                tests.append((left, right, axis, ml, mr, active))
            s_all = jnp.sum(packed)

            for k in range(npack):
                left, right, axis, ml, mr, active = tests[k]
                want_l = (((s_all // (_PACK_BASE ** (2 * k)))
                           % _PACK_BASE) > 0) & active
                want_r = (((s_all // (_PACK_BASE ** (2 * k + 1)))
                           % _PACK_BASE) > 0) & active
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

                wl_i = want_l & jnp.logical_not(l_leaf)
                wr_i = want_r & jnp.logical_not(r_leaf)
                s0 = sgn_ref[3 * k + 0]
                s1 = sgn_ref[3 * k + 1]
                s2 = sgn_ref[3 * k + 2]
                pos_dir = jnp.where(axis == 0, s0,
                                    jnp.where(axis == 1, s1, s2)) > 0
                first = jnp.where(pos_dir, left, right)
                second = jnp.where(pos_dir, right, left)
                wf = jnp.where(pos_dir, wl_i, wr_i)
                ws = jnp.where(pos_dir, wr_i, wl_i)

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

            return (tuple(curs), tuple(sps), tuple(qns))

        # ---------------- outer: bursts of traversal + drains ------------
        def outer_cond(state):
            curs, sps, qns = state
            alive = False
            for k in range(npack):
                alive = alive | (curs[k] >= 0) | (sps[k] > 0) | (qns[k] > 0)
            return alive

        def outer_body(state):
            state = jax.lax.while_loop(inner_cond, inner_body, state)
            curs, sps, qns = state
            curs = list(curs)
            sps = list(sps)
            qns = list(qns)

            for k in range(npack):
                @pl.when(qns[k] > 0)
                def _(k=k, qn=qns[k]):
                    drain(k, qn)
                    if any_hit:
                        sl = slice(k * rows, (k + 1) * rows)
                        hit_ref[k] = jnp.all(prim_out[sl] >= 0).astype(
                            jnp.int32)

                qns[k] = jnp.int32(0)
                if any_hit:
                    stop = hit_ref[k] > 0
                    curs[k] = jnp.where(stop, -1, curs[k])
                    sps[k] = jnp.where(stop, 0, sps[k])

            return (tuple(curs), tuple(sps), tuple(qns))

        zero = jnp.int32(0)
        if any_hit:
            for k in range(npack):
                hit_ref[k] = 0
        init = (tuple(zero for _ in range(npack)),
                tuple(zero for _ in range(npack)),
                tuple(zero for _ in range(npack)))
        jax.lax.while_loop(outer_cond, outer_body, init)

    return kernel


@partial(jax.jit, static_argnames=("any_hit", "rows", "npack", "rpl"))
def packet7_trace(tri_rows, meta, bounds, prim_map, o, d, t_min, t_max,
                  any_hit: bool = False, rows: int = ROWS,
                  npack: int = NPACK, rpl: int = 1):
    """Traverse with the packed layout (two-level loop). Returns
    (t, prim, u, v) with prim mapped to original triangle ids (-1 = miss)."""
    assert npack <= 2, "packed want readout overflows int32 for npack > 2"
    r = o.shape[0]
    block_rows = rows * npack
    packet = block_rows * LANES
    pad = (-r) % packet
    total_rows = (r + pad) // LANES

    def prep(x, fill=0.0):
        x = jnp.pad(x, (0, pad), constant_values=fill)
        return x.reshape(total_rows, LANES)

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    args = (prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2]),
            prep(d[:, 0], 1.0), prep(d[:, 1], 1.0), prep(d[:, 2], 1.0),
            prep(t_min, 1.0), prep(t_max, 0.0))

    grid = total_rows // block_rows
    ray_spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pl.ANY)

    out_shape = [
        jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((total_rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32),
    ]
    t, slot, u, v = pl.pallas_call(
        _kernel(any_hit, npack, rows, rpl),
        grid=(grid,),
        in_specs=[full] * 3 + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((npack * STACK_DEPTH,), jnp.int32),
            pltpu.SMEM((npack * QSTRIDE,), jnp.int32),
            pltpu.SMEM((npack * QSTRIDE,), jnp.int32),
            pltpu.SMEM((npack * 3,), jnp.int32),
            pltpu.SMEM((npack,), jnp.int32),
            pltpu.VMEM((block_rows, LANES), jnp.float32),
            pltpu.VMEM((block_rows, LANES), jnp.float32),
            pltpu.VMEM((block_rows, LANES), jnp.float32),
            pltpu.VMEM(bounds.shape, bounds.dtype),
            pltpu.VMEM(meta.shape, meta.dtype),
            pltpu.VMEM(tri_rows.shape, tri_rows.dtype),
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
