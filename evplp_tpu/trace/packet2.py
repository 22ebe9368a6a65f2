"""Pallas packet BVH traversal, v2 — VMEM-packed layout.

v1 (trace/packet.py) stores triangle/node SoA as (T, 3) arrays; Mosaic pads
the minor dim to 128 lanes, costing 512 B per row (42x bloat: ~30k tris max)
and 9 scalar dynamic VMEM loads per triangle (measured dominant cost).

v2 packs EIGHT triangles per 128-lane row:
    row r = [tri_{8r}  : v0.xyz e1.xyz e2.xyz pad7] x 8 slots of 16 lanes
and pads every BVH leaf to exactly 8 aligned slots, so a leaf is ONE dynamic
vector load + 72 static lane extracts.  Node bounds ride one (8,)-row load.
Returned prim ids are slot indices; `prim_map` converts to triangle ids.
The packed arrays are built by accel.bvh.build_bvh (pk_* fields).

VMEM budget: tris 64 B/tri + nodes 512 B + map -> ~200k tris in ~40 MB.
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
PACKET_ROWS = 64
STACK_DEPTH = 96

_COMPILED = True


def set_interpret(interpret: bool) -> None:
    global _COMPILED
    _COMPILED = not interpret


def _kernel(any_hit: bool):
    def kernel(bounds_ref, meta_ref, tri_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tmin_ref, tmax_ref,
               t_out, prim_out, u_out, v_out,
               stack_ref, ivx_ref, ivy_ref, ivz_ref):
        t_out[:] = tmax_ref[:]
        prim_out[:] = jnp.full_like(prim_out, -1)
        u_out[:] = jnp.zeros_like(u_out)
        v_out[:] = jnp.zeros_like(v_out)

        big = jnp.float32(3.0e38)
        for d_ref, iv_ref in ((dx_ref, ivx_ref), (dy_ref, ivy_ref),
                              (dz_ref, ivz_ref)):
            dv = d_ref[:]
            iv_ref[:] = jnp.where(jnp.abs(dv) > 1e-20, 1.0 / dv,
                                  jnp.where(dv >= 0.0, big, -big))

        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        tmin = tmin_ref[:]

        stack_ref[0] = jnp.int32(0)

        def cond(sp):
            return sp > 0

        def body(sp):
            sp = sp - 1
            node = stack_ref[sp]
            nb = bounds_ref[node, :]          # (8,) one row load

            ivx, ivy, ivz = ivx_ref[:], ivy_ref[:], ivz_ref[:]
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
            want = (tn <= tf) & (tf >= 0.0) & (tn <= t_out[:])
            if any_hit:
                want = want & (prim_out[:] < 0)
            node_wanted = jnp.any(want)

            mrow = meta_ref[node, :]          # (4,) [count, row/left, right]
            count = mrow[0]
            is_leaf = count > 0

            @pl.when(node_wanted & is_leaf)
            def _():
                row = mrow[1]
                blk = tri_ref[row, :]         # (128,) = 8 packed triangles
                # accumulate the leaf's best hit in registers; touch the
                # output refs once per leaf instead of once per triangle
                best_t = t_out[:]
                best_p = prim_out[:]
                best_u = u_out[:]
                best_v = v_out[:]
                for k in range(LEAF):         # static unroll, static extracts
                    b = k * SLOT
                    v0x_, v0y_, v0z_ = blk[b], blk[b + 1], blk[b + 2]
                    e1x_, e1y_, e1z_ = blk[b + 3], blk[b + 4], blk[b + 5]
                    e2x_, e2y_, e2z_ = blk[b + 6], blk[b + 7], blk[b + 8]

                    px = dy * e2z_ - dz * e2y_
                    py = dz * e2x_ - dx * e2z_
                    pz = dx * e2y_ - dy * e2x_
                    det = e1x_ * px + e1y_ * py + e1z_ * pz
                    inv_det = jnp.where(jnp.abs(det) > TRI_EPS, 1.0 / det, 0.0)
                    tx = ox - v0x_
                    ty = oy - v0y_
                    tz = oz - v0z_
                    uu = (tx * px + ty * py + tz * pz) * inv_det
                    qx = ty * e1z_ - tz * e1y_
                    qy = tz * e1x_ - tx * e1z_
                    qz = tx * e1y_ - ty * e1x_
                    vv = (dx * qx + dy * qy + dz * qz) * inv_det
                    tt = (e2x_ * qx + e2y_ * qy + e2z_ * qz) * inv_det

                    ok = ((jnp.abs(det) > TRI_EPS) & (uu >= 0.0) & (vv >= 0.0)
                          & (uu + vv <= 1.0) & (tt > tmin) & (tt < best_t)
                          & (k < count))
                    if any_hit:
                        ok = ok & (best_p < 0)
                    slot_id = row * LEAF + k
                    best_t = jnp.where(ok, tt, best_t)
                    best_p = jnp.where(ok, slot_id, best_p)
                    best_u = jnp.where(ok, uu, best_u)
                    best_v = jnp.where(ok, vv, best_v)
                t_out[:] = best_t
                prim_out[:] = best_p
                u_out[:] = best_u
                v_out[:] = best_v

            push = node_wanted & jnp.logical_not(is_leaf)

            @pl.when(push)
            def _():
                stack_ref[sp] = mrow[2]           # right child
                stack_ref[sp + 1] = node + 1      # left child (popped first)

            sp = jnp.where(push, sp + 2, sp)
            if any_hit:
                sp = jnp.where(jnp.all(prim_out[:] >= 0), 0, sp)
            return sp

        jax.lax.while_loop(cond, body, jnp.int32(1))

    return kernel


@partial(jax.jit, static_argnames=("any_hit", "packet_rows"))
def packet2_trace(tri_rows, meta, bounds, prim_map, o, d, t_min, t_max,
                  any_hit: bool = False, packet_rows: int = PACKET_ROWS):
    """Traverse with the packed layout. Returns (t, prim, u, v) with prim
    already mapped to original triangle ids (-1 = miss)."""
    r = o.shape[0]
    packet = packet_rows * LANES
    pad = (-r) % packet
    rows = (r + pad) // LANES

    def prep(x, fill=0.0):
        x = jnp.pad(x, (0, pad), constant_values=fill)
        return x.reshape(rows, LANES)

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    args = (prep(o[:, 0]), prep(o[:, 1]), prep(o[:, 2]),
            prep(d[:, 0], 1.0), prep(d[:, 1], 1.0), prep(d[:, 2], 1.0),
            prep(t_min, 1.0), prep(t_max, 0.0))

    grid = rows // packet_rows
    ray_spec = pl.BlockSpec((packet_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    out_shape = [
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
    ]
    t, slot, u, v = pl.pallas_call(
        _kernel(any_hit),
        grid=(grid,),
        in_specs=[full] * 3 + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.VMEM((packet_rows, LANES), jnp.float32),
            pltpu.VMEM((packet_rows, LANES), jnp.float32),
            pltpu.VMEM((packet_rows, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=not _COMPILED,
    )(bounds, meta, tri_rows, *args)

    flat = lambda x: x.reshape(-1)[:r]
    slot = flat(slot)
    prim = jnp.where(slot >= 0, prim_map[jnp.maximum(slot, 0)], -1)
    return flat(t), prim, flat(u), flat(v)
