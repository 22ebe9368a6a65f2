"""Pallas packet BVH traversal, v5 — fused node rows.

packet3 spends its scalar/latency budget on per-iteration VMEM row loads:
meta[node], meta[left], meta[right], bounds[left], bounds[right] — five
dynamic row loads whose scalar extractions sit on the steering critical
path.  v5 stores BOTH children's bounds and packed metas in the PARENT's
row pair (accel/bvh.py pk_fb/pk_fm), so one iteration loads exactly two
rows.  Everything else (interleaved packets, ordered descent by split
axis, SMEM leaf queue with burst drains, dummy-slot branch-free steering,
any-hit fake-hit dead lanes + early exit) matches packet3.

Child encoding (shared with packet4): leaf (1<<30)|(count<<24)|leaf_row,
internal = BVH2 node id.
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
NPACK = 2                # interleaved packets per kernel instance
QCAP = 8                 # leaf-queue capacity per packet
QSTRIDE = QCAP + 1       # + one sacrificial dummy slot
STACK_DEPTH = 64

_COMPILED = True
_PROBE_COUNT_ITERS = False   # stash the loop-iteration count in u_out[0,0]


def set_interpret(interpret: bool) -> None:
    global _COMPILED
    _COMPILED = not interpret


def _kernel(any_hit: bool, npack: int, rows: int):
    def kernel(fb_ref, fm_ref, tri_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tmin_ref, tmax_ref,
               t_out, prim_out, u_out, v_out,
               stack_ref, qrow_ref, qcnt_ref, sgn_ref, hit_ref,
               ivx_ref, ivy_ref, ivz_ref):
        t_out[:] = tmax_ref[:]
        if any_hit:
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

        def slab(k, fb, base):
            sl = slice(k * rows, (k + 1) * rows)
            ox, oy, oz = ox_ref[sl], oy_ref[sl], oz_ref[sl]
            ivx, ivy, ivz = ivx_ref[sl], ivy_ref[sl], ivz_ref[sl]
            t0x = (fb[base + 0] - ox) * ivx
            t1x = (fb[base + 3] - ox) * ivx
            t0y = (fb[base + 1] - oy) * ivy
            t1y = (fb[base + 4] - oy) * ivy
            t0z = (fb[base + 2] - oz) * ivz
            t1z = (fb[base + 5] - oz) * ivz
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
            curs, sps, qns, _ = state
            alive = False
            for k in range(npack):
                alive = alive | (curs[k] >= 0) | (sps[k] > 0) | (qns[k] > 0)
            return alive

        def body(state):
            curs, sps, qns, iters = state
            curs = list(curs)
            sps = list(sps)
            qns = list(qns)

            # ---- phase 1: one fused row pair + 2 child tests per packet ---
            tests = []
            for k in range(npack):
                active = curs[k] >= 0
                node = jnp.maximum(curs[k], 0)
                fb = fb_ref[node, :]
                fm = fm_ref[node, :]
                want_l = slab(k, fb, 0) & active
                want_r = slab(k, fb, 6) & active
                tests.append((fm, want_l, want_r))

            # ---- phase 2: scalar steering (dummy-slot writes) ----
            for k in range(npack):
                fm, want_l, want_r = tests[k]
                p_l, p_r, axis = fm[0], fm[1], fm[2]
                l_leaf = ((p_l >> 30) & 1) > 0
                r_leaf = ((p_r >> 30) & 1) > 0

                enq_l = want_l & l_leaf
                slot_l = k * QSTRIDE + jnp.where(enq_l, qns[k], QCAP)
                qrow_ref[slot_l] = p_l & 0xffffff
                qcnt_ref[slot_l] = (p_l >> 24) & 0x3f
                qn = qns[k] + enq_l.astype(jnp.int32)

                enq_r = want_r & r_leaf
                slot_r = k * QSTRIDE + jnp.where(enq_r, qn, QCAP)
                qrow_ref[slot_r] = p_r & 0xffffff
                qcnt_ref[slot_r] = (p_r >> 24) & 0x3f
                qn = qn + enq_r.astype(jnp.int32)

                wl = want_l & jnp.logical_not(l_leaf)
                wr = want_r & jnp.logical_not(r_leaf)
                s0 = sgn_ref[3 * k + 0]
                s1 = sgn_ref[3 * k + 1]
                s2 = sgn_ref[3 * k + 2]
                pos_dir = jnp.where(axis == 0, s0,
                                    jnp.where(axis == 1, s1, s2)) > 0
                first = jnp.where(pos_dir, p_l, p_r)
                second = jnp.where(pos_dir, p_r, p_l)
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

            # ---- phase 3: leaf drains ----
            for k in range(npack):
                done = (curs[k] < 0) & (sps[k] <= 0)
                do_drain = (qns[k] >= QCAP - 1) | (done & (qns[k] > 0))

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

            return (tuple(curs), tuple(sps), tuple(qns), iters + 1)

        zero = jnp.int32(0)
        init = (tuple(zero for _ in range(npack)),
                tuple(zero for _ in range(npack)),
                tuple(zero for _ in range(npack)), zero)
        final = jax.lax.while_loop(cond, body, init)
        if _PROBE_COUNT_ITERS:
            u_out[0:1, :] = jnp.full((1, LANES), final[3].astype(jnp.float32))

    return kernel


@partial(jax.jit, static_argnames=("any_hit", "rows", "npack"))
def packet5_trace(tri_rows, fb, fm, prim_map, o, d, t_min, t_max,
                  any_hit: bool = False, rows: int = ROWS,
                  npack: int = NPACK):
    """Traverse with fused node rows. Returns (t, prim, u, v)."""
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

    # invariant scene inputs: CONSTANT index_map so the pipeline copies
    # them in once instead of re-DMAing every grid step (measured 277 us
    # per step of pure overhead without this)
    def full(x):
        return pl.BlockSpec(x.shape, lambda i: (0,) * x.ndim,
                            memory_space=pltpu.VMEM)

    out_shape = [
        jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((total_rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((total_rows, LANES), jnp.float32),
    ]
    t, slot, u, v = pl.pallas_call(
        _kernel(any_hit, npack, rows),
        grid=(grid,),
        in_specs=[full(fb), full(fm), full(tri_rows)] + [ray_spec] * 8,
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
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=not _COMPILED,
    )(fb, fm, tri_rows, *args)

    flat = lambda x: x.reshape(-1)[:r]
    slot = flat(slot)
    prim = jnp.where(slot >= 0, prim_map[jnp.maximum(slot, 0)], -1)
    return flat(t), prim, flat(u), flat(v)
