"""Pallas packet BVH traversal, v4 — 4-wide tree, ordered, leaf-queued.

The packet3 loop is scalar/latency-bound (halving the slab-test vector work
changes time <10%; the per-iteration fixed costs — lane extractions, the
vector->scalar `any` reductions, steering ALU, loop mechanics — dominate).
v4 halves the iteration count by traversing a 4-wide collapsed tree
(accel/bvh.py `_collapse_bvh4`): each step loads ONE bounds row (4 child
boxes) + ONE meta row, runs 4 slab tests whose reductions overlap, and
steers with branch-free dummy-slot writes.  Ordered descent uses the
node's precomputed per-octant slot order (2 bits/slot); any-hit skips
ordering and exits early via the leaf-drain hit flag.

Leaf layout is shared with packet2/3 (pk_tri_rows / pk_prim_map).
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
ROWS = 64                # rows per packet (rays = ROWS*LANES)
NPACK = 1                # interleaved packets per kernel instance
QCAP = 8                 # leaf-queue capacity per packet
QSTRIDE = QCAP + 1       # + one sacrificial dummy slot
STACK_DEPTH = 64

_COMPILED = True


def set_interpret(interpret: bool) -> None:
    global _COMPILED
    _COMPILED = not interpret


def _kernel(any_hit: bool, npack: int, rows: int):
    def kernel(qb_ref, qm_ref, tri_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tmin_ref, tmax_ref,
               t_out, prim_out, u_out, v_out,
               stack_ref, qrow_ref, qcnt_ref, oct_ref, hit_ref,
               ivx_ref, ivy_ref, ivz_ref):
        t_out[:] = tmax_ref[:]
        if any_hit:
            # empty-interval lanes (pre-culled segments) start as fake hits
            # so they can't block the packet's early exit
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

        # dominant direction octant per packet (bit a = positive on axis a)
        for k in range(npack):
            sl = slice(k * rows, (k + 1) * rows)
            s0 = (jnp.sum(dx_ref[sl]) >= 0.0).astype(jnp.int32)
            s1 = (jnp.sum(dy_ref[sl]) >= 0.0).astype(jnp.int32)
            s2 = (jnp.sum(dz_ref[sl]) >= 0.0).astype(jnp.int32)
            oct_ref[k] = s0 | (s1 << 1) | (s2 << 2)

        def slab(k, qb, j):
            sl = slice(k * rows, (k + 1) * rows)
            ox, oy, oz = ox_ref[sl], oy_ref[sl], oz_ref[sl]
            ivx, ivy, ivz = ivx_ref[sl], ivy_ref[sl], ivz_ref[sl]
            b = 6 * j
            t0x = (qb[b + 0] - ox) * ivx
            t1x = (qb[b + 3] - ox) * ivx
            t0y = (qb[b + 1] - oy) * ivy
            t1y = (qb[b + 4] - oy) * ivy
            t0z = (qb[b + 2] - oz) * ivz
            t1z = (qb[b + 5] - oz) * ivz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            want = (tn <= tf) & (tf >= 0.0) & (tn <= t_out[sl])
            if any_hit:
                want = want & (prim_out[sl] < 0)
            return jnp.any(want)

        def drain(k, qn):
            """Test all queued leaves of packet k."""
            sl = slice(k * rows, (k + 1) * rows)
            ox, oy, oz = ox_ref[sl], oy_ref[sl], oz_ref[sl]
            dx, dy, dz = dx_ref[sl], dy_ref[sl], dz_ref[sl]
            tmin = tmin_ref[sl]
            best_t = t_out[sl]
            best_p = prim_out[sl]
            best_u = u_out[sl]
            best_v = v_out[sl]
            for q in range(QCAP):
                row = qrow_ref[k * QSTRIDE + q]
                count = qcnt_ref[k * QSTRIDE + q]
                live = q < qn
                blk = tri_ref[jnp.where(live, row, 0), :]
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
                          & (j < count) & live)
                    slot_id = row * LEAF + j
                    if any_hit:
                        best_p = jnp.where(ok & (best_p < 0), slot_id, best_p)
                    else:
                        best_t = jnp.where(ok, tt, best_t)
                        best_p = jnp.where(ok, slot_id, best_p)
                        best_u = jnp.where(ok, uu, best_u)
                        best_v = jnp.where(ok, vv, best_v)
            prim_out[sl] = best_p
            if not any_hit:
                t_out[sl] = best_t
                u_out[sl] = best_u
                v_out[sl] = best_v

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

            # ---- phase 1: 4 child tests per packet, straight-line ----
            tests = []
            for k in range(npack):
                active = curs[k] >= 0
                node = jnp.maximum(curs[k], 0)
                qb = qb_ref[node, :]
                qm = qm_ref[node, :]
                wants = [slab(k, qb, j) & active for j in range(4)]
                tests.append((qm, wants))

            # ---- phase 2: scalar steering (dummy-slot writes) ----
            for k in range(npack):
                qm, wants = tests[k]
                packed = [qm[0], qm[1], qm[2], qm[3]]
                qn = qns[k]
                sp = sps[k]
                nxt = jnp.int32(-1)

                if any_hit:
                    slots = [3, 2, 1, 0]   # order irrelevant for occlusion
                else:
                    # per-octant near-to-far order, visited far -> near so
                    # the nearest wanted child ends in `nxt`
                    oct = oct_ref[k]
                    word = jnp.where(oct < 4, qm[4], qm[5])
                    byte = (word >> ((oct & 3) * 8)) & 0xff
                    slots = [(byte >> (2 * s)) & 3 for s in (3, 2, 1, 0)]

                wbits = (wants[0].astype(jnp.int32)
                         | (wants[1].astype(jnp.int32) << 1)
                         | (wants[2].astype(jnp.int32) << 2)
                         | (wants[3].astype(jnp.int32) << 3))
                for slot in slots:
                    w = ((wbits >> slot) & 1) > 0
                    if any_hit:
                        p = packed[slot]
                    else:
                        p = jnp.where(
                            slot == 0, packed[0],
                            jnp.where(slot == 1, packed[1],
                                      jnp.where(slot == 2, packed[2],
                                                packed[3])))
                    is_leaf = ((p >> 30) & 1) > 0

                    enq = w & is_leaf
                    qslot = k * QSTRIDE + jnp.where(enq, qn, QCAP)
                    qrow_ref[qslot] = p & 0xffffff
                    qcnt_ref[qslot] = (p >> 24) & 0x3f
                    qn = qn + enq.astype(jnp.int32)

                    wi = w & jnp.logical_not(is_leaf)
                    push = wi & (nxt >= 0)
                    stack_ref[k * STACK_DEPTH +
                              jnp.where(push, sp, STACK_DEPTH - 1)] = nxt
                    sp = sp + push.astype(jnp.int32)
                    nxt = jnp.where(wi, p, nxt)

                # out of nodes: pop (unconditional read + select)
                top = stack_ref[k * STACK_DEPTH + jnp.maximum(sp - 1, 0)]
                need_pop = (nxt < 0) & (sp > 0)
                nxt = jnp.where(need_pop, top, nxt)
                sp = sp - need_pop.astype(jnp.int32)

                curs[k] = nxt
                sps[k] = sp
                qns[k] = qn

            # ---- phase 3: leaf drains (fat vector bursts) ----
            for k in range(npack):
                done = (curs[k] < 0) & (sps[k] <= 0)
                # enqueues add <=4 per iteration, so qn <= QCAP here
                do_drain = (qns[k] >= QCAP - 3) | (done & (qns[k] > 0))

                @pl.when(do_drain)
                def _(k=k, qn=qns[k]):
                    drain(k, qn)
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

            return (tuple(curs), tuple(sps), tuple(qns))

        zero = jnp.int32(0)
        init = (tuple(zero for _ in range(npack)),
                tuple(zero for _ in range(npack)),
                tuple(zero for _ in range(npack)))
        jax.lax.while_loop(cond, body, init)

    return kernel


@partial(jax.jit, static_argnames=("any_hit", "rows", "npack"))
def packet4_trace(tri_rows, qb, qm, prim_map, o, d, t_min, t_max,
                  any_hit: bool = False, rows: int = ROWS,
                  npack: int = NPACK):
    """Traverse the 4-wide tree. Returns (t, prim, u, v) with prim mapped
    to original triangle ids (-1 = miss)."""
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
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    out_shape = [
        jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((total_rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32),
    ]
    t, slot, u, v = pl.pallas_call(
        _kernel(any_hit, npack, rows),
        grid=(grid,),
        in_specs=[full] * 3 + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((npack * STACK_DEPTH,), jnp.int32),
            pltpu.SMEM((npack * QSTRIDE,), jnp.int32),
            pltpu.SMEM((npack * QSTRIDE,), jnp.int32),
            pltpu.SMEM((npack,), jnp.int32),
            pltpu.SMEM((npack,), jnp.int32),
            pltpu.VMEM((block_rows, LANES), jnp.float32),
            pltpu.VMEM((block_rows, LANES), jnp.float32),
            pltpu.VMEM((block_rows, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=not _COMPILED,
    )(qb, qm, tri_rows, *args)

    flat = lambda x: x.reshape(-1)[:r]
    slot = flat(slot)
    if prim_map is None:     # slot-ordered scene: slot IS the triangle id
        prim = slot
    else:
        prim = jnp.where(slot >= 0, prim_map[jnp.maximum(slot, 0)], -1)
    return flat(t), prim, flat(u), flat(v)
