"""Pallas packet BVH traversal, v3 — interleaved ordered traversal.

packet2's loop is latency-bound: each pop's vector->scalar `any` reduction
sits on the critical path of the next steering decision.  v3 restructures:

  * K independent packets traverse in ONE kernel body; their per-iteration
    child tests and reductions are independent straight-line code, so the
    scheduler overlaps packet B's vector tests with packet A's reduction.
  * Two children are tested per step ("cur" register): the current node is
    ALWAYS internal; wanted leaf children go to a per-packet leaf QUEUE in
    SMEM, wanted internal children become cur / get pushed.  Steering uses
    dummy-slot SMEM writes instead of branches.
  * Ordered descent: the near child (by the node's split axis vs the
    packet's dominant direction sign) is visited first, tightening t before
    the far subtree is tested.
  * Leaf queue drains in bursts of up to QCAP leaves (8 packed triangles
    each) with the best-hit state held in registers for the whole burst.

Same packed layout as packet2 (accel/bvh.py pk_*); meta[:,3] = split axis.
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
QCAP = 8                 # leaf-queue capacity per packet
QSTRIDE = QCAP + 1       # + one sacrificial dummy slot
STACK_DEPTH = 64

_COMPILED = True
# timing probes (produce WRONG results; for perf archaeology only) — read
# from env so fresh-process bisection works (module globals don't
# invalidate jit caches, NOTES.md)
import os as _os
_PROBE_SKIP_DRAIN = _os.environ.get(
    "EVPLP_PROBE_SKIP_DRAIN", "0") == "1"   # stub out leaf drains
_PROBE_HALF_SLAB = _os.environ.get(
    "EVPLP_PROBE_HALF_SLAB", "0") == "1"    # slab-test half the rows


def set_interpret(interpret: bool) -> None:
    global _COMPILED
    _COMPILED = not interpret


# base for the packed want-bit readout: per-(1,128) row the lane-sum of a
# 0/1 mask is <= 128, so base 129 keeps npack*2 counts separable in int32
# (129^3 * 128 = 2.7e8 < 2^31 for npack=2)
_PACK_BASE = 129


def _kernel(any_hit: bool, npack: int, rows: int, rpl: int = 1,
            stats: bool = False, sync_pack: bool = True,
            fused: bool = False, stream: bool = False,
            packed16: bool = False, smem_meta: bool = False,
            drain_gather: bool = False):
    """fused: node meta lives in bounds lanes 6/7 (BVH.fused_nodes) — no
    meta array in VMEM; the current node's meta words are CARRIED in the
    scalar loop state (selected when the node was chosen as a child) and
    the stack holds (node, w0, w1) triples.

    smem_meta: node meta words live in SMEM (DMA'd once at grid step 0) and
    every per-node meta fetch is a SCALAR load — the Mosaic census showed
    the per-iteration meta fetches were vreg->sreg `vector.extract`s (the
    vector<->scalar round trips every flat structural A/B preserved); SMEM
    keeps the steering entirely in the scalar domain.  Uses the fused word
    encoding regardless of the bounds layout; node count is capped by SMEM
    size (SMEM_META_NODE_CAP).

    drain_gather: fetch drained triangle components as VECTOR lane
    broadcasts (tpu.dynamic_gather via take_along_axis) instead of 126
    scalar extract+broadcast round trips per leaf row.  ~3x cheaper per
    row in ISOLATION, but measured 0.91-0.96x at kernel level on every
    production workload (tools/bench_meta_ab.py) — the extracts are
    independent and pipeline under the traversal, while the gathers add
    vector latency to the drain burst.  Default OFF; kept for the A/B
    record.

    stream: triangle rows stay in HBM; each leaf ENQUEUE starts an async
    copy of its rpl rows into a per-queue-slot VMEM staging buffer, and the
    drain waits per entry — the DMA overlaps the traversal iterations
    between enqueue and drain.  Node bounds stay VMEM-resident, so the
    scene-size ceiling becomes node-bound instead of (node+tri)-bound."""
    carry_meta = fused and not smem_meta
    def kernel(bounds_ref, meta_ref, tri_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tmin_ref, tmax_ref,
               t_out, prim_out, u_out, v_out,
               *refs):
        if stats:
            out_ref = refs[0]
            stat_out = refs[-1]     # SMEM scratch: persists across grid steps
            refs = refs[1:-1]
        meta_sm = None
        if smem_meta:
            meta_sm = refs[-1]
            refs = refs[:-1]
        if stream:
            (stack_ref, qrow_ref, qcnt_ref, sgn_ref, hit_ref,
             ivx_ref, ivy_ref, ivz_ref,
             bounds_s, meta_s, tri_s, dma_sem, tri_sem) = refs
        else:
            (stack_ref, qrow_ref, qcnt_ref, sgn_ref, hit_ref,
             ivx_ref, ivy_ref, ivz_ref,
             bounds_s, meta_s, tri_s, dma_sem) = refs

        def _stage_dma(k, q, row):
            """Copy descriptor for queue slot q of packet k <- leaf row
            `row` (recreated at wait time with the same refs/slices)."""
            return pltpu.make_async_copy(
                tri_ref.at[pl.ds(row, rpl)],
                tri_s.at[pl.ds((k * QCAP + q) * rpl, rpl)],
                tri_sem.at[k * QCAP + q])

        def _node_row(n):
            """A node's 8-lane bounds(+meta) row.  packed16: 16 nodes
            share one 128-lane VMEM row — fetch row n>>4 and rotate the
            node's lanes to 0-7 (pltpu.roll takes a traced shift).
            The rotate must be 2-D: Mosaic's tpu.dynamic_rotate rejects
            1-D vectors ("Unsupported 1D shape"), so fetch a (1, 128)
            block, rotate along lanes, and take row 0."""
            if not packed16:
                return bounds_s[n, :]
            raw = bounds_s[pl.ds(n >> 4, 1), :]        # (1, 128)
            base = (n & 15) * 8
            return pltpu.roll(raw, shift=(128 - base) & 127, axis=1)[0]

        # scene residency: the bounds/meta (and, unless streaming, tri)
        # arrays live in HBM (ANY) and are DMA'd into VMEM scratch ONCE at
        # grid step 0 — scratch persists across the sequential grid steps,
        # so later packets pay nothing.  (auto-streamed full-array inputs
        # were re-fetched per step: ~180 us/step at 102k tris, half the
        # coherent-workload runtime)
        @pl.when(pl.program_id(0) == 0)
        def _():
            copies = [(bounds_ref, bounds_s)]
            if not stream:
                copies.append((tri_ref, tri_s))
            if smem_meta:
                copies.append((meta_ref, meta_sm))
            elif not fused:
                copies.insert(1, (meta_ref, meta_s))
            for src, dst in copies:
                cp = pltpu.make_async_copy(src, dst, dma_sem)
                cp.start()
                cp.wait()
        if stats:
            # accumulate in SCRATCH (grid steps run sequentially in one
            # kernel instance); the output block is only written at the end —
            # writing the output every step races its double-buffered copies
            @pl.when(pl.program_id(0) == 0)
            def _():
                for i in range(4):
                    stat_out[i] = 0
        t_out[:] = tmax_ref[:]
        if any_hit:
            # empty-interval lanes (tmax <= tmin: pre-culled segments) start
            # as fake hits so they can't block the packet's early exit; the
            # caller never reads pre-culled lanes
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

        # dominant direction sign per packet & axis (ordered descent)
        for k in range(npack):
            sl = slice(k * rows, (k + 1) * rows)
            sgn_ref[3 * k + 0] = (jnp.sum(dx_ref[sl]) >= 0.0).astype(jnp.int32)
            sgn_ref[3 * k + 1] = (jnp.sum(dy_ref[sl]) >= 0.0).astype(jnp.int32)
            sgn_ref[3 * k + 2] = (jnp.sum(dz_ref[sl]) >= 0.0).astype(jnp.int32)

        def slab(k, nb):
            if _PROBE_HALF_SLAB:
                sl = slice(k * rows, k * rows + rows // 2)
            else:
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
            else:
                # cull DEAD lanes (empty interval: terminated paths).  For
                # closest hits t_out starts at t_max=0, and a dead lane
                # whose origin sits INSIDE a node still passes the slab
                # test (t_near < 0 <= t_out) — without this mask every
                # terminated path re-walks its origin's subtree (any-hit
                # packets were already culled via the fake-hit prim)
                want = want & (tmax_ref[sl] > tmin_ref[sl])
            if sync_pack:
                # sublane-reduced (1, LANES) 0/1 row: stays in the vector
                # domain so several tests can share ONE scalar readout
                return jnp.any(want, axis=0, keepdims=True).astype(jnp.int32)
            return jnp.any(want)

        def drain(k, qn):
            """Test all queued leaves of packet k (fori over the ACTUAL
            queue fill: a statically unrolled QCAP-entry drain was ~20x more
            straight-line vector code, and instruction fetch of that body
            dominated the whole kernel at ~200 us per grid step)."""
            sl = slice(k * rows, (k + 1) * rows)
            ox, oy, oz = ox_ref[sl], oy_ref[sl], oz_ref[sl]
            dx, dy, dz = dx_ref[sl], dy_ref[sl], dz_ref[sl]
            tmin = tmin_ref[sl]

            def entry(q, carry):
                row = qrow_ref[k * QSTRIDE + q]
                count = qcnt_ref[k * QSTRIDE + q]
                if stream:
                    # the enqueue started this slot's copy; block until the
                    # rows are staged (usually already done: the DMA ran
                    # under the traversal iterations since the enqueue)
                    _stage_dma(k, q, row).wait()
                    blk_base = (k * QCAP + q) * rpl
                else:
                    blk_base = row

                def row_tests(rr, blk_row, slot_row, carry):
                    """Test the LEAF triangles of row `blk_row` (traced
                    scalar; staging row when streaming); slot ids come from
                    the ORIGINAL row id `slot_row`; `rr` is the row's index
                    within the leaf for the count mask."""
                    best_t, best_p, best_u, best_v = carry
                    if drain_gather:
                        # vector-domain component fetch: lane b of the row,
                        # broadcast to all lanes by a full-vreg dynamic
                        # gather with a constant index — no vreg->sreg
                        # extract + sreg->vreg broadcast round trip (the
                        # scalar form measured ~3x slower per row)
                        blk8 = jnp.broadcast_to(
                            tri_s[pl.ds(blk_row, 1), :], (8, LANES))

                        def _lane(c):
                            idx = jnp.full((8, LANES), c, jnp.int32)
                            return jnp.take_along_axis(
                                blk8, idx, axis=1)[0:1, :]
                    else:
                        blk = tri_s[blk_row, :]

                        def _lane(c):
                            return blk[c]
                    for j in range(LEAF):
                        b = j * SLOT
                        v0x_, v0y_, v0z_ = _lane(b), _lane(b + 1), _lane(b + 2)
                        e1x_, e1y_, e1z_ = _lane(b + 3), _lane(b + 4), _lane(b + 5)
                        e2x_, e2y_, e2z_ = _lane(b + 6), _lane(b + 7), _lane(b + 8)

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
                        slot_id = slot_row * LEAF + j
                        if any_hit:
                            # occlusion only: no uv/t refinement needed
                            best_p = jnp.where(ok & (best_p < 0), slot_id,
                                               best_p)
                        else:
                            best_t = jnp.where(ok, tt, best_t)
                            best_p = jnp.where(ok, slot_id, best_p)
                            best_u = jnp.where(ok, uu, best_u)
                            best_v = jnp.where(ok, vv, best_v)
                    return best_t, best_p, best_u, best_v

                if rpl <= 4:
                    # production leaf sizes (14/42): straight-line, exactly
                    # the round-2 code
                    for rr in range(rpl):
                        carry = row_tests(rr, blk_base + rr, row + rr, carry)
                else:
                    # fat leaves: roll the row loop so the instruction
                    # footprint stays ONE row of tests (an unrolled
                    # rpl*LEAF body re-creates the instruction-fetch trap
                    # the rolled drain fixed, see drain() docstring)
                    carry = jax.lax.fori_loop(
                        0, rpl,
                        lambda rr, c: row_tests(rr, blk_base + rr, row + rr, c),
                        carry)
                return carry

            init = (t_out[sl], prim_out[sl], u_out[sl], v_out[sl])
            best_t, best_p, best_u, best_v = jax.lax.fori_loop(
                0, qn, entry, init)
            prim_out[sl] = best_p
            if not any_hit:
                t_out[sl] = best_t
                u_out[sl] = best_u
                v_out[sl] = best_v
            return jnp.int32(0)

        def _meta_words(row):
            """(w0, w1) from a fused node row's lanes 6/7 (bitcast the
            VECTOR, then extract — Mosaic has no scalar f32->i32 bitcast)."""
            wrow = jax.lax.bitcast_convert_type(row, jnp.int32)
            return wrow[6], wrow[7]

        def cond(state):
            curs, sps, qns = state[0], state[1], state[2]
            alive = False
            for k in range(npack):
                alive = alive | (curs[k] >= 0) | (sps[k] > 0) | (qns[k] > 0)
            return alive

        def body(state):
            if carry_meta:
                curs, sps, qns, w0s, w1s = state
                w0s = list(w0s)
                w1s = list(w1s)
            else:
                curs, sps, qns = state
            curs = list(curs)
            sps = list(sps)
            qns = list(qns)
            if stats:
                live_packets = jnp.int32(0)
                for k in range(npack):
                    live_packets = live_packets + (curs[k] >= 0).astype(
                        jnp.int32)
                stat_out[0] = stat_out[0] + live_packets

            # ---- phase 1: child tests, straight-line across packets ----
            # sync_pack: every packet's two want-masks are reduced to
            # (1, LANES) rows in the VECTOR domain and base-129-packed into
            # ONE lane-sum scalar readout per iteration — the 2-vector->
            # scalar-`any`s-per-level serial latency was the one quantity
            # every flat round-2 variant (p4/p5/p6, npack, rows) shared
            tests = []
            packed = None
            for k in range(npack):
                active = curs[k] >= 0
                node = jnp.maximum(curs[k], 0)
                left = node + 1
                if smem_meta:
                    # scalar-domain steering: meta words come from SMEM —
                    # no vreg->sreg extract on the critical path
                    w1c = meta_sm[2 * node + 1]
                    right = w1c >> 2
                    axis = w1c & 3
                    rsafe = jnp.maximum(right, 0)
                    ml = (meta_sm[2 * left], meta_sm[2 * left + 1])
                    mr = (meta_sm[2 * rsafe], meta_sm[2 * rsafe + 1])
                    wl = slab(k, _node_row(left))
                    wr = slab(k, _node_row(rsafe))
                elif fused:
                    right = w1s[k] >> 2
                    axis = w1s[k] & 3
                    row_l = _node_row(left)
                    row_r = _node_row(jnp.maximum(right, 0))
                    ml = _meta_words(row_l)      # (w0, w1) of each child
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

            # ---- phase 2: scalar steering (dummy-slot writes, no branches)
            for k in range(npack):
                left, right, axis, ml, mr, want_l, want_r = tests[k]
                if smem_meta:
                    # 9-bit count field: unlike the fused bounds-lane words
                    # (6 bits, leaf <= 42 builds only), smem meta serves ANY
                    # leaf size, and test leaves reach 112+ triangles
                    cnt_l, lrow_l = ml[0] & 511, ml[0] >> 9
                    cnt_r, lrow_r = mr[0] & 511, mr[0] >> 9
                elif fused:
                    cnt_l, lrow_l = ml[0] & 63, ml[0] >> 6
                    cnt_r, lrow_r = mr[0] & 63, mr[0] >> 6
                else:
                    cnt_l, lrow_l = ml[0], ml[1]
                    cnt_r, lrow_r = mr[0], mr[1]
                l_leaf = cnt_l > 0
                r_leaf = cnt_r > 0

                # enqueue wanted leaf children
                enq_l = want_l & l_leaf
                slot_l = k * QSTRIDE + jnp.where(enq_l, qns[k], QCAP)
                qrow_ref[slot_l] = lrow_l
                qcnt_ref[slot_l] = cnt_l
                if stream:
                    # start this slot's HBM->staging copy NOW: it completes
                    # under the traversal iterations before the drain
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

                # internal children: near first (packet sign on split axis)
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
                if carry_meta:
                    # carried meta words follow the same child selection
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

                # out of nodes: pop (unconditional read + select)
                tslot = k * STACK_DEPTH + jnp.maximum(sp - 1, 0)
                need_pop = (cur < 0) & (sp > 0)
                if carry_meta:
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

            # ---- phase 3: leaf drains (infrequent fat vector bursts) ----
            for k in range(npack):
                done = (curs[k] < 0) & (sps[k] <= 0)
                # enqueues add <=2 per iteration, so qn <= QCAP here
                do_drain = (qns[k] >= QCAP - 1) | (done & (qns[k] > 0))

                @pl.when(do_drain)
                def _(k=k, qn=qns[k]):
                    if not _PROBE_SKIP_DRAIN:
                        drain(k, qn)
                    if stats:
                        # executed drain cost is QCAP*rpl rows regardless of
                        # fill (dead entries still run masked); useful = qn
                        stat_out[1] = stat_out[1] + QCAP * rpl
                        stat_out[2] = stat_out[2] + qn * rpl
                    if any_hit:
                        sl = slice(k * rows, (k + 1) * rows)
                        hit_ref[k] = jnp.all(prim_out[sl] >= 0).astype(
                            jnp.int32)

                qns[k] = jnp.where(do_drain, 0, qns[k])
                if any_hit:
                    stop = do_drain & (hit_ref[k] > 0)
                    curs[k] = jnp.where(stop, -1, curs[k])
                    sps[k] = jnp.where(stop, 0, sps[k])
                    qns[k] = jnp.where(stop, 0, qns[k])

            if carry_meta:
                return (tuple(curs), tuple(sps), tuple(qns),
                        tuple(w0s), tuple(w1s))
            return (tuple(curs), tuple(sps), tuple(qns))

        zero = jnp.int32(0)
        zeros = tuple(zero for _ in range(npack))
        if carry_meta:
            # root meta words from the fused root row
            w0r, w1r = _meta_words(_node_row(0))
            init = (zeros, zeros, zeros,
                    tuple(w0r for _ in range(npack)),
                    tuple(w1r for _ in range(npack)))
        else:
            init = (zeros, zeros, zeros)
        jax.lax.while_loop(cond, body, init)
        if stats:
            for i in range(4):
                out_ref[0, i] = stat_out[i]

    return kernel


# SMEM-resident meta ceiling: 2 words/node x 4 B; 512 KB of SMEM scratch
# compiles on v5e (1 MB does not) — cap well below to leave room for the
# stacks/queues and compiler-internal scalars
SMEM_META_NODE_CAP = 56_000


@partial(jax.jit, static_argnames=("any_hit", "rows", "npack", "rpl",
                                   "stats", "sync_pack", "fused",
                                   "stream_tris", "packed16", "smem_meta",
                                   "drain_gather"))
def packet3_trace(tri_rows, meta, bounds, prim_map, o, d, t_min, t_max,
                  any_hit: bool = False, rows: int = ROWS,
                  npack: int = NPACK, rpl: int = 1, stats: bool = False,
                  sync_pack: bool = True, fused: bool = False,
                  stream_tris: bool = False, packed16: bool = False,
                  smem_meta: bool | None = None,
                  drain_gather: bool = False):
    assert not sync_pack or npack <= 2, "packed readout overflows for npack>2"
    """Traverse with the packed layout. Returns (t, prim, u, v) with prim
    already mapped to original triangle ids (-1 = miss).

    smem_meta None = auto: on when the node count fits the SMEM budget
    (scalar-domain steering; see _kernel docstring)."""
    if smem_meta is None:
        smem_meta = meta.shape[0] <= SMEM_META_NODE_CAP
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
    out_specs = [ray_spec] * 4
    if stats:
        out_shape.append(jax.ShapeDtypeStruct((1, 4), jnp.int32))
        out_specs.append(pl.BlockSpec((1, 4), lambda i: (0, 0),
                                      memory_space=pltpu.SMEM))
    n_nodes = meta.shape[0]
    if smem_meta:
        # interleaved (w0_0, w1_0, w0_1, ...) — the kernel DMA's this
        # straight into SMEM at grid step 0.  9-bit count field (the fused
        # bounds-lane encoding's 6 bits only covers leaf <= 42 builds)
        if n_nodes > SMEM_META_NODE_CAP:
            raise ValueError(
                f"smem_meta: {n_nodes} nodes exceeds SMEM_META_NODE_CAP "
                f"({SMEM_META_NODE_CAP})")
        if not isinstance(meta, jax.core.Tracer):
            import numpy as _np
            _max_count = int(_np.asarray(meta[:, 0]).max(initial=0))
            if _max_count >= 512:
                raise ValueError(
                    f"smem_meta: leaf count {_max_count} overflows the "
                    "9-bit w0 field (leaf_size must be < 512)")
        w0 = meta[:, 0] | (meta[:, 1] << 9)
        w1 = (meta[:, 2] << 2) | meta[:, 3]
        meta = jnp.stack([w0, w1], axis=1).reshape(-1)
        meta_vmem = pltpu.VMEM((1, 4), jnp.int32)   # dummy meta_s
    elif fused:
        # no meta in VMEM: a dummy row keeps the kernel signature stable
        meta = meta[:1]
        meta_vmem = pltpu.VMEM(meta.shape, meta.dtype)
    else:
        meta_vmem = pltpu.VMEM(meta.shape, meta.dtype)
    carry_meta = fused and not smem_meta
    tri_scratch = (pltpu.VMEM((npack * QCAP * rpl, LANES), tri_rows.dtype)
                   if stream_tris else
                   pltpu.VMEM(tri_rows.shape, tri_rows.dtype))
    t, slot, u, v, *stat = pl.pallas_call(
        _kernel(any_hit, npack, rows, rpl, stats, sync_pack, fused,
                stream_tris, packed16, smem_meta, drain_gather),
        grid=(grid,),
        in_specs=[full] * 3 + [ray_spec] * 8,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((npack * STACK_DEPTH * (3 if carry_meta else 1),),
                       jnp.int32),
            pltpu.SMEM((npack * QSTRIDE,), jnp.int32),
            pltpu.SMEM((npack * QSTRIDE,), jnp.int32),
            pltpu.SMEM((npack * 3,), jnp.int32),
            pltpu.SMEM((npack,), jnp.int32),
            pltpu.VMEM((block_rows, LANES), jnp.float32),
            pltpu.VMEM((block_rows, LANES), jnp.float32),
            pltpu.VMEM((block_rows, LANES), jnp.float32),
            pltpu.VMEM(bounds.shape, bounds.dtype),
            meta_vmem,
            tri_scratch,
            pltpu.SemaphoreType.DMA,
        ] + ([pltpu.SemaphoreType.DMA((npack * QCAP,))] if stream_tris
             else [])
          + ([pltpu.SMEM((2 * n_nodes,), jnp.int32)] if smem_meta else [])
          + ([pltpu.SMEM((4,), jnp.int32)] if stats else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(112 if fused else 100) * 1024 * 1024),
        interpret=not _COMPILED,
    )(bounds, meta, tri_rows, *args)

    flat = lambda x: x.reshape(-1)[:r]
    slot = flat(slot)
    if prim_map is None:     # slot-ordered scene: slot IS the triangle id
        prim = slot
    else:
        prim = jnp.where(slot >= 0, prim_map[jnp.maximum(slot, 0)], -1)
    if stats:
        return flat(t), prim, flat(u), flat(v), stat[0]
    return flat(t), prim, flat(u), flat(v)
