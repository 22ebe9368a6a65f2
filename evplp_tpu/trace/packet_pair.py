"""Pallas packet BVH traversal, paired variant: two rays per lane.

PT's bounce loop traces, per path vertex, (1) a closest-hit extension ray
and (2) an any-hit NEE shadow segment — both from the SAME origin
(pathtracing.cu:112-228 does the same two rtTrace calls per vertex).  Run
separately each trace pays the per-packet scheduling tax and its own
sort/gather machinery; their BVH working sets overlap heavily (shared
origin), so one fused walk visits ~the union of the two node sets instead
of the sum, and one dispatch replaces two.

Kernel shape is packet3's (interleaved ordered traversal, SMEM leaf
queues, sync_pack scalar readout, optional fused node rows); the delta:

  * per lane: shared origin + ray A (dir da, closest, shrinking bound
    t_out) + ray B (dir db, any-hit segment, fixed bound tmaxb, per-lane
    retired once occluded),
  * slab step tests the child against BOTH rays; want = wantA | wantB,
  * leaf drains run Moller for both rays per triangle (vector work is
    not the bottleneck — round-2/3 A/Bs measured 2-4x flops flat),
  * ordered-descent steering signs come from ray A (B has no ordering
    need: any-hit).

Outputs: (t, prim, u, v) for ray A and occ-slot (>= 0 means occluded)
for ray B.  Pre-culled B lanes (tmaxb <= tminb) start retired.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from evplp_tpu.trace.intersect import TRI_EPS
from evplp_tpu.trace.packet3 import (LANES, LEAF, QCAP, QSTRIDE, SLOT,
                                     STACK_DEPTH, _PACK_BASE)

_COMPILED = True


def set_interpret(interpret: bool) -> None:
    global _COMPILED
    _COMPILED = not interpret


def _kernel(npack: int, rows: int, rpl: int = 1, sync_pack: bool = True,
            fused: bool = False, a_any_hit: bool = False,
            stream: bool = False, packed16: bool = False):
    """a_any_hit: ray A is an occlusion segment too (the dual-segment VPL
    shape — two records gathered per lane from one pixel origin): A's bound
    stays fixed at tmaxa, lanes retire on first hit, and the packet exits
    early once every lane resolved BOTH segments.

    stream: HBM-resident tri rows with enqueue-time per-slot DMA staging
    (same mechanism as packet3 stream_tris)."""
    def kernel(bounds_ref, meta_ref, tri_ref,
               ox_ref, oy_ref, oz_ref,
               dax_ref, day_ref, daz_ref, tmina_ref, tmaxa_ref,
               dbx_ref, dby_ref, dbz_ref, tminb_ref, tmaxb_ref,
               t_out, prim_out, u_out, v_out, occ_out,
               *refs):
        if stream:
            (stack_ref, qrow_ref, qcnt_ref, sgn_ref, hit_ref,
             ivax_ref, ivay_ref, ivaz_ref,
             ivbx_ref, ivby_ref, ivbz_ref,
             bounds_s, meta_s, tri_s, dma_sem, tri_sem) = refs
        else:
            (stack_ref, qrow_ref, qcnt_ref, sgn_ref, hit_ref,
             ivax_ref, ivay_ref, ivaz_ref,
             ivbx_ref, ivby_ref, ivbz_ref,
             bounds_s, meta_s, tri_s, dma_sem) = refs

        def _stage_dma(k, q, row):
            return pltpu.make_async_copy(
                tri_ref.at[pl.ds(row, rpl)],
                tri_s.at[pl.ds((k * QCAP + q) * rpl, rpl)],
                tri_sem.at[k * QCAP + q])

        def _node_row(n):
            # packed16: 16 nodes per 128-lane row; 2-D rotate — Mosaic's
            # dynamic_rotate rejects 1-D vectors (see packet3._node_row)
            if not packed16:
                return bounds_s[n, :]
            raw = bounds_s[pl.ds(n >> 4, 1), :]        # (1, 128)
            base = (n & 15) * 8
            return pltpu.roll(raw, shift=(128 - base) & 127, axis=1)[0]
        # scene residency: DMA once at grid step 0 (scratch persists)
        @pl.when(pl.program_id(0) == 0)
        def _():
            copies = [(bounds_ref, bounds_s)]
            if not stream:
                copies.append((tri_ref, tri_s))
            if not fused:
                copies.insert(1, (meta_ref, meta_s))
            for src, dst in copies:
                cp = pltpu.make_async_copy(src, dst, dma_sem)
                cp.start()
                cp.wait()

        t_out[:] = tmaxa_ref[:]
        if a_any_hit:
            # retired-at-start lanes: pre-culled segments (empty interval)
            prim_out[:] = jnp.where(tmaxa_ref[:] <= tmina_ref[:], 0, -1)
        else:
            prim_out[:] = jnp.full_like(prim_out, -1)
        occ_out[:] = jnp.where(tmaxb_ref[:] <= tminb_ref[:], 0, -1)
        u_out[:] = jnp.zeros_like(u_out)
        v_out[:] = jnp.zeros_like(v_out)

        big = jnp.float32(3.0e38)
        for d_ref, iv_ref in ((dax_ref, ivax_ref), (day_ref, ivay_ref),
                              (daz_ref, ivaz_ref), (dbx_ref, ivbx_ref),
                              (dby_ref, ivby_ref), (dbz_ref, ivbz_ref)):
            dv = d_ref[:]
            iv_ref[:] = jnp.where(jnp.abs(dv) > 1e-20, 1.0 / dv,
                                  jnp.where(dv >= 0.0, big, -big))

        # ordered-descent signs from ray A (the closest-hit walk)
        for k in range(npack):
            sl = slice(k * rows, (k + 1) * rows)
            sgn_ref[3 * k + 0] = (jnp.sum(dax_ref[sl]) >= 0.0).astype(jnp.int32)
            sgn_ref[3 * k + 1] = (jnp.sum(day_ref[sl]) >= 0.0).astype(jnp.int32)
            sgn_ref[3 * k + 2] = (jnp.sum(daz_ref[sl]) >= 0.0).astype(jnp.int32)

        def slab(k, nb):
            sl = slice(k * rows, (k + 1) * rows)
            ox, oy, oz = ox_ref[sl], oy_ref[sl], oz_ref[sl]

            def one(ivx, ivy, ivz, bound, live):
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
                want = (tn <= tf) & (tf >= 0.0) & (tn <= bound)
                if live is not None:
                    want = want & live
                return want

            want_a = one(ivax_ref[sl], ivay_ref[sl], ivaz_ref[sl],
                         t_out[sl],
                         (prim_out[sl] < 0) if a_any_hit else None)
            want_b = one(ivbx_ref[sl], ivby_ref[sl], ivbz_ref[sl],
                         tmaxb_ref[sl], occ_out[sl] < 0)
            want = want_a | want_b
            if sync_pack:
                return jnp.any(want, axis=0, keepdims=True).astype(jnp.int32)
            return jnp.any(want)

        def drain(k, qn):
            sl = slice(k * rows, (k + 1) * rows)
            ox, oy, oz = ox_ref[sl], oy_ref[sl], oz_ref[sl]
            dax, day, daz = dax_ref[sl], day_ref[sl], daz_ref[sl]
            dbx, dby, dbz = dbx_ref[sl], dby_ref[sl], dbz_ref[sl]
            tmina = tmina_ref[sl]
            tminb = tminb_ref[sl]
            tmaxb = tmaxb_ref[sl]

            def entry(q, carry):
                row = qrow_ref[k * QSTRIDE + q]
                count = qcnt_ref[k * QSTRIDE + q]
                if stream:
                    _stage_dma(k, q, row).wait()
                    blk_base = (k * QCAP + q) * rpl
                else:
                    blk_base = row

                def row_tests(rr, row_off, slot_row, carry):
                    best_t, best_p, best_u, best_v, occ = carry
                    blk = tri_s[row_off, :]          # staging row if stream
                    for j in range(LEAF):
                        b = j * SLOT
                        v0x_, v0y_, v0z_ = blk[b], blk[b + 1], blk[b + 2]
                        e1x_, e1y_, e1z_ = blk[b + 3], blk[b + 4], blk[b + 5]
                        e2x_, e2y_, e2z_ = blk[b + 6], blk[b + 7], blk[b + 8]
                        tx = ox - v0x_
                        ty = oy - v0y_
                        tz = oz - v0z_
                        in_leaf = rr * LEAF + j < count
                        slot_id = slot_row * LEAF + j

                        # ray A: closest
                        px = day * e2z_ - daz * e2y_
                        py = daz * e2x_ - dax * e2z_
                        pz = dax * e2y_ - day * e2x_
                        det = e1x_ * px + e1y_ * py + e1z_ * pz
                        inv_det = jnp.where(jnp.abs(det) > TRI_EPS,
                                            1.0 / det, 0.0)
                        uu = (tx * px + ty * py + tz * pz) * inv_det
                        qx = ty * e1z_ - tz * e1y_
                        qy = tz * e1x_ - tx * e1z_
                        qz = tx * e1y_ - ty * e1x_
                        vv = (dax * qx + day * qy + daz * qz) * inv_det
                        tt = (e2x_ * qx + e2y_ * qy + e2z_ * qz) * inv_det
                        ok = ((jnp.abs(det) > TRI_EPS) & (uu >= 0.0)
                              & (vv >= 0.0) & (uu + vv <= 1.0)
                              & (tt > tmina) & (tt < best_t) & in_leaf)
                        if a_any_hit:
                            best_p = jnp.where(ok & (best_p < 0), slot_id,
                                               best_p)
                        else:
                            best_t = jnp.where(ok, tt, best_t)
                            best_p = jnp.where(ok, slot_id, best_p)
                            best_u = jnp.where(ok, uu, best_u)
                            best_v = jnp.where(ok, vv, best_v)

                        # ray B: any-hit segment
                        px = dby * e2z_ - dbz * e2y_
                        py = dbz * e2x_ - dbx * e2z_
                        pz = dbx * e2y_ - dby * e2x_
                        det = e1x_ * px + e1y_ * py + e1z_ * pz
                        inv_det = jnp.where(jnp.abs(det) > TRI_EPS,
                                            1.0 / det, 0.0)
                        ub = (tx * px + ty * py + tz * pz) * inv_det
                        qx = ty * e1z_ - tz * e1y_
                        qy = tz * e1x_ - tx * e1z_
                        qz = tx * e1y_ - ty * e1x_
                        vb = (dbx * qx + dby * qy + dbz * qz) * inv_det
                        tb = (e2x_ * qx + e2y_ * qy + e2z_ * qz) * inv_det
                        okb = ((jnp.abs(det) > TRI_EPS) & (ub >= 0.0)
                               & (vb >= 0.0) & (ub + vb <= 1.0)
                               & (tb > tminb) & (tb < tmaxb) & in_leaf)
                        occ = jnp.where(okb & (occ < 0), slot_id, occ)
                    return best_t, best_p, best_u, best_v, occ

                if rpl <= 4:
                    for rr in range(rpl):
                        carry = row_tests(rr, blk_base + rr, row + rr, carry)
                else:
                    carry = jax.lax.fori_loop(
                        0, rpl,
                        lambda rr, c: row_tests(rr, blk_base + rr, row + rr,
                                                c),
                        carry)
                return carry

            init = (t_out[sl], prim_out[sl], u_out[sl], v_out[sl],
                    occ_out[sl])
            best_t, best_p, best_u, best_v, occ = jax.lax.fori_loop(
                0, qn, entry, init)
            t_out[sl] = best_t
            prim_out[sl] = best_p
            u_out[sl] = best_u
            v_out[sl] = best_v
            occ_out[sl] = occ
            return jnp.int32(0)

        def _meta_words(row):
            wrow = jax.lax.bitcast_convert_type(row, jnp.int32)
            return wrow[6], wrow[7]

        def cond(state):
            curs, sps, qns = state[0], state[1], state[2]
            alive = False
            for k in range(npack):
                alive = alive | (curs[k] >= 0) | (sps[k] > 0) | (qns[k] > 0)
            return alive

        def body(state):
            if fused:
                curs, sps, qns, w0s, w1s = state
                w0s = list(w0s)
                w1s = list(w1s)
            else:
                curs, sps, qns = state
            curs = list(curs)
            sps = list(sps)
            qns = list(qns)

            # ---- phase 1: child tests ----
            tests = []
            packed = None
            for k in range(npack):
                active = curs[k] >= 0
                node = jnp.maximum(curs[k], 0)
                left = node + 1
                if fused:
                    right = w1s[k] >> 2
                    axis = w1s[k] & 3
                    row_l = _node_row(left)
                    row_r = _node_row(jnp.maximum(right, 0))
                    ml = _meta_words(row_l)
                    mr = _meta_words(row_r)
                    wl = slab(k, row_l)
                    wr = slab(k, row_r)
                else:
                    mrow = meta_s[node, :]
                    right = mrow[2]
                    axis = mrow[3]
                    ml = meta_s[left, :]
                    mr = meta_s[jnp.maximum(right, 0), :]
                    wl = slab(k, bounds_s[left, :])
                    wr = slab(k, bounds_s[jnp.maximum(right, 0), :])
                if sync_pack:
                    part = (wl * (_PACK_BASE ** (2 * k))
                            + wr * (_PACK_BASE ** (2 * k + 1)))
                    packed = part if packed is None else packed + part
                    tests.append((left, right, axis, ml, mr, active))
                else:
                    tests.append((left, right, axis, ml, mr,
                                  wl & active, wr & active))
            if sync_pack:
                s_all = jnp.sum(packed)
                new_tests = []
                for k in range(npack):
                    left, right, axis, ml, mr, active = tests[k]
                    want_l = (((s_all // (_PACK_BASE ** (2 * k)))
                               % _PACK_BASE) > 0) & active
                    want_r = (((s_all // (_PACK_BASE ** (2 * k + 1)))
                               % _PACK_BASE) > 0) & active
                    new_tests.append((left, right, axis, ml, mr,
                                      want_l, want_r))
                tests = new_tests

            # ---- phase 2: scalar steering ----
            for k in range(npack):
                left, right, axis, ml, mr, want_l, want_r = tests[k]
                if fused:
                    cnt_l, lrow_l = ml[0] & 63, ml[0] >> 6
                    cnt_r, lrow_r = mr[0] & 63, mr[0] >> 6
                else:
                    cnt_l, lrow_l = ml[0], ml[1]
                    cnt_r, lrow_r = mr[0], mr[1]
                l_leaf = cnt_l > 0
                r_leaf = cnt_r > 0

                enq_l = want_l & l_leaf
                slot_l = k * QSTRIDE + jnp.where(enq_l, qns[k], QCAP)
                qrow_ref[slot_l] = lrow_l
                qcnt_ref[slot_l] = cnt_l
                if stream:
                    @pl.when(enq_l)
                    def _(k=k, q=qns[k], row=lrow_l):
                        _stage_dma(k, q, row).start()
                qn = qns[k] + enq_l.astype(jnp.int32)

                enq_r = want_r & r_leaf
                slot_r = k * QSTRIDE + jnp.where(enq_r, qn, QCAP)
                qrow_ref[slot_r] = lrow_r
                qcnt_ref[slot_r] = cnt_r
                if stream:
                    @pl.when(enq_r)
                    def _(k=k, q=qn, row=lrow_r):
                        _stage_dma(k, q, row).start()
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
                sslot = k * STACK_DEPTH + jnp.where(push, sp,
                                                    STACK_DEPTH - 1)
                if fused:
                    w0_f = jnp.where(pos_dir, ml[0], mr[0])
                    w1_f = jnp.where(pos_dir, ml[1], mr[1])
                    w0_s = jnp.where(pos_dir, mr[0], ml[0])
                    w1_s = jnp.where(pos_dir, mr[1], ml[1])
                    w0 = jnp.where(wf, w0_f, jnp.where(ws, w0_s, 0))
                    w1 = jnp.where(wf, w1_f, jnp.where(ws, w1_s, 0))
                    stack_ref[3 * sslot] = second
                    stack_ref[3 * sslot + 1] = w0_s
                    stack_ref[3 * sslot + 2] = w1_s
                else:
                    stack_ref[sslot] = second
                sp = sp + push.astype(jnp.int32)

                tslot = k * STACK_DEPTH + jnp.maximum(sp - 1, 0)
                need_pop = (cur < 0) & (sp > 0)
                if fused:
                    cur = jnp.where(need_pop, stack_ref[3 * tslot], cur)
                    w0 = jnp.where(need_pop, stack_ref[3 * tslot + 1], w0)
                    w1 = jnp.where(need_pop, stack_ref[3 * tslot + 2], w1)
                    w0s[k] = w0
                    w1s[k] = w1
                else:
                    cur = jnp.where(need_pop, stack_ref[tslot], cur)
                sp = sp - need_pop.astype(jnp.int32)

                curs[k] = cur
                sps[k] = sp
                qns[k] = qn

            # ---- phase 3: leaf drains ----
            for k in range(npack):
                done = (curs[k] < 0) & (sps[k] <= 0)
                do_drain = (qns[k] >= QCAP - 1) | (done & (qns[k] > 0))

                @pl.when(do_drain)
                def _(k=k, qn=qns[k]):
                    drain(k, qn)
                    if a_any_hit:
                        sl = slice(k * rows, (k + 1) * rows)
                        hit_ref[k] = jnp.all((prim_out[sl] >= 0)
                                             & (occ_out[sl] >= 0)).astype(
                            jnp.int32)

                qns[k] = jnp.where(do_drain, 0, qns[k])
                if a_any_hit:
                    stop = do_drain & (hit_ref[k] > 0)
                    curs[k] = jnp.where(stop, -1, curs[k])
                    sps[k] = jnp.where(stop, 0, sps[k])
                    qns[k] = jnp.where(stop, 0, qns[k])

            if fused:
                return (tuple(curs), tuple(sps), tuple(qns),
                        tuple(w0s), tuple(w1s))
            return (tuple(curs), tuple(sps), tuple(qns))

        zero = jnp.int32(0)
        zeros = tuple(zero for _ in range(npack))
        if fused:
            w0r, w1r = _meta_words(_node_row(0))
            init = (zeros, zeros, zeros,
                    tuple(w0r for _ in range(npack)),
                    tuple(w1r for _ in range(npack)))
        else:
            init = (zeros, zeros, zeros)
        jax.lax.while_loop(cond, body, init)

    return kernel


@partial(jax.jit, static_argnames=("rows", "npack", "rpl", "sync_pack",
                                   "fused", "a_any_hit", "stream_tris",
                                   "packed16"))
def packet_pair_trace(tri_rows, meta, bounds, prim_map, o,
                      da, t_min_a, t_max_a, db, t_min_b, t_max_b,
                      rows: int = 32, npack: int = 2, rpl: int = 1,
                      sync_pack: bool = True, fused: bool = False,
                      a_any_hit: bool = False, stream_tris: bool = False,
                      packed16: bool = False):
    """Fused closest(A) + any-hit(B) trace from shared origins.

    Returns (t, prim, u, v, occ): prim mapped to original triangle ids
    (-1 = miss) for ray A; occ True where segment B is occluded (pre-culled
    lanes report True — callers mask them).  a_any_hit: ray A is an
    occlusion segment too (dual-segment mode; t/u/v are then meaningless
    and prim>=0 just means occluded)."""
    assert not sync_pack or npack <= 2
    r = o.shape[0]
    block_rows = rows * npack
    packet = block_rows * LANES
    pad = (-r) % packet
    total_rows = (r + pad) // LANES

    def prep(x, fill=0.0):
        x = jnp.pad(x, (0, pad), constant_values=fill)
        return x.reshape(total_rows, LANES)

    bc = lambda x: jnp.broadcast_to(jnp.asarray(x, jnp.float32), (r,))
    args = (prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2]),
            prep(da[:, 0], 1.0), prep(da[:, 1], 1.0), prep(da[:, 2], 1.0),
            prep(bc(t_min_a), 1.0), prep(bc(t_max_a), 0.0),
            prep(db[:, 0], 1.0), prep(db[:, 1], 1.0), prep(db[:, 2], 1.0),
            prep(bc(t_min_b), 1.0), prep(bc(t_max_b), 0.0))

    grid = total_rows // block_rows
    ray_spec = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pl.ANY)

    out_shape = [
        jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((total_rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((total_rows, LANES), jnp.int32),
    ]
    if fused:
        meta = meta[:1]
    tri_scratch = (pltpu.VMEM((npack * QCAP * rpl, LANES), tri_rows.dtype)
                   if stream_tris else
                   pltpu.VMEM(tri_rows.shape, tri_rows.dtype))
    t, slot, u, v, occ_slot = pl.pallas_call(
        _kernel(npack, rows, rpl, sync_pack, fused, a_any_hit, stream_tris,
                packed16),
        grid=(grid,),
        in_specs=[full] * 3 + [ray_spec] * 13,
        out_specs=[ray_spec] * 5,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((npack * STACK_DEPTH * (3 if fused else 1),),
                       jnp.int32),
            pltpu.SMEM((npack * QSTRIDE,), jnp.int32),
            pltpu.SMEM((npack * QSTRIDE,), jnp.int32),
            pltpu.SMEM((npack * 3,), jnp.int32),
            pltpu.SMEM((npack,), jnp.int32),
            pltpu.VMEM((block_rows, LANES), jnp.float32),
            pltpu.VMEM((block_rows, LANES), jnp.float32),
            pltpu.VMEM((block_rows, LANES), jnp.float32),
            pltpu.VMEM((block_rows, LANES), jnp.float32),
            pltpu.VMEM((block_rows, LANES), jnp.float32),
            pltpu.VMEM((block_rows, LANES), jnp.float32),
            pltpu.VMEM(bounds.shape, bounds.dtype),
            pltpu.VMEM(meta.shape, meta.dtype),
            tri_scratch,
            pltpu.SemaphoreType.DMA,
        ] + ([pltpu.SemaphoreType.DMA((npack * QCAP,))] if stream_tris
             else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(112 if fused else 100) * 1024 * 1024),
        interpret=not _COMPILED,
    )(bounds, meta, tri_rows, *args)

    flat = lambda x: x.reshape(-1)[:r]
    slot = flat(slot)
    if prim_map is None:
        prim = slot
    else:
        prim = jnp.where(slot >= 0, prim_map[jnp.maximum(slot, 0)], -1)
    return flat(t), prim, flat(u), flat(v), flat(occ_slot) >= 0
