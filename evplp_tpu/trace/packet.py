"""Pallas packet BVH traversal, v1 — reference implementation.

SUPERSEDED for dispatch by trace/packet3.py (the production kernel:
VMEM-packed tri rows, fused/packed16 node layouts, HBM streaming; this
version's (T, 3) arrays pad the minor dim to 128 lanes in VMEM, capping
scenes at ~30k triangles).  Kept as the readable form of the algorithm and
for differential testing; same traversal semantics.

Replaces OptiX rtTrace (reference triangleintersect.cu + Trbvh) for scenes
above the brute-force threshold.  Design (classic SIMD packet tracing mapped
onto TPU's scalar+vector split):

  * a GRID step owns a packet of PACKET_ROWS x 128 rays resident in VMEM,
  * the BVH (skip-pointer DFS layout, accel/bvh.py) and the triangle SoA
    live whole in VMEM (~200k triangles fit the ~16 MB budget),
  * ONE scalar traversal stack in SMEM is shared by the whole packet:
    each loop step pops a node, slab-tests it against ALL rays (vector ops),
    descends if any ray wants it, and intersects leaf triangles
    scalar-triangle x vector-rays,
  * per-ray closest-t pruning keeps the packet's working set shrinking;
    the any-hit variant retires rays individually and exits when the whole
    packet is occluded.

Coherent packets (primary rays, per-VPL shadow fans) visit near-minimal
node sets; incoherent photon bounces degrade gracefully to union-traversal.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from evplp_tpu.accel.bvh import BVH
from evplp_tpu.trace.intersect import TRI_EPS, Triangles

PACKET_ROWS = 64         # rays per packet = PACKET_ROWS * 128
LANES = 128
STACK_DEPTH = 96         # fits any sane BVH depth (2 entries per level)
BIG = jnp.float32(3.0e38)

# set False to run kernels in interpreter mode (CPU tests)
_COMPILED = True


def set_interpret(interpret: bool) -> None:
    global _COMPILED
    _COMPILED = not interpret


def _packet_kernel(any_hit: bool):
    def kernel(nmin_ref, nmax_ref, skip_ref, first_ref, count_ref,
               v0_ref, e1_ref, e2_ref,
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
            d = d_ref[:]
            iv_ref[:] = jnp.where(jnp.abs(d) > 1e-20, 1.0 / d,
                                  jnp.where(d >= 0.0, big, -big))

        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        tmin = tmin_ref[:]

        stack_ref[0] = jnp.int32(0)

        def cond(sp):
            return sp > 0

        def body(sp):
            sp = sp - 1
            node = stack_ref[sp]

            ivx, ivy, ivz = ivx_ref[:], ivy_ref[:], ivz_ref[:]
            t0x = (nmin_ref[node, 0] - ox) * ivx
            t1x = (nmax_ref[node, 0] - ox) * ivx
            t0y = (nmin_ref[node, 1] - oy) * ivy
            t1y = (nmax_ref[node, 1] - oy) * ivy
            t0z = (nmin_ref[node, 2] - oz) * ivz
            t1z = (nmax_ref[node, 2] - oz) * ivz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            live = t_out[:]
            want = (tn <= tf) & (tf >= 0.0) & (tn <= live)
            if any_hit:
                want = want & (prim_out[:] < 0)
            node_wanted = jnp.any(want)

            count = count_ref[node, 0]
            is_leaf = count > 0

            @pl.when(node_wanted & is_leaf)
            def _():
                first = first_ref[node, 0]

                def tri_body(j, _):
                    idx = first + j
                    v0x_ = v0_ref[idx, 0]
                    v0y_ = v0_ref[idx, 1]
                    v0z_ = v0_ref[idx, 2]
                    e1x_ = e1_ref[idx, 0]
                    e1y_ = e1_ref[idx, 1]
                    e1z_ = e1_ref[idx, 2]
                    e2x_ = e2_ref[idx, 0]
                    e2y_ = e2_ref[idx, 1]
                    e2z_ = e2_ref[idx, 2]

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
                          & (uu + vv <= 1.0) & (tt > tmin) & (tt < t_out[:]))
                    if any_hit:
                        ok = ok & (prim_out[:] < 0)
                    t_out[:] = jnp.where(ok, tt, t_out[:])
                    prim_out[:] = jnp.where(ok, idx, prim_out[:])
                    u_out[:] = jnp.where(ok, uu, u_out[:])
                    v_out[:] = jnp.where(ok, vv, v_out[:])
                    return 0

                jax.lax.fori_loop(0, count, tri_body, 0)

            push = node_wanted & jnp.logical_not(is_leaf)

            @pl.when(push)
            def _():
                stack_ref[sp] = skip_ref[node + 1, 0]  # right child
                stack_ref[sp + 1] = node + 1           # left child (popped first)

            sp = jnp.where(push, sp + 2, sp)
            if any_hit:
                sp = jnp.where(jnp.all(prim_out[:] >= 0), 0, sp)
            return sp

        jax.lax.while_loop(cond, body, jnp.int32(1))

    return kernel


def _pad_nodes(arr, mult=8):
    pad = (-arr.shape[0]) % mult
    if arr.ndim == 1:
        return jnp.pad(arr, (0, pad))
    return jnp.pad(arr, ((0, pad), (0, 0)))


@partial(jax.jit, static_argnames=("any_hit", "packet_rows"))
def packet_trace(tris: Triangles, bvh: BVH, o, d, t_min, t_max,
                 any_hit: bool = False, packet_rows: int = PACKET_ROWS):
    """Packet-traverse a batch of rays. Returns (t, prim, u, v)."""
    r = o.shape[0]
    packet = packet_rows * LANES
    pad = (-r) % packet
    rows = (r + pad) // LANES

    def prep(x, fill=0.0):
        x = jnp.pad(x, (0, pad), constant_values=fill)
        return x.reshape(rows, LANES)

    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    ox = prep(o[:, 0])
    oy = prep(o[:, 1])
    oz = prep(o[:, 2])
    dx = prep(d[:, 0], 1.0)
    dy = prep(d[:, 1], 1.0)
    dz = prep(d[:, 2], 1.0)
    tmin = prep(t_min, 1.0)
    tmax = prep(t_max, 0.0)  # padded rays: tmax < tmin -> never hit

    nmin = _pad_nodes(bvh.node_min)
    nmax = _pad_nodes(bvh.node_max)
    # scalar node attributes as (N, 1): Mosaic supports dynamic indexing on
    # the sublane (leading) dim but not on the lane dim of 1-D arrays
    skip = _pad_nodes(bvh.node_skip)[:, None]
    first = _pad_nodes(bvh.node_first)[:, None]
    count = _pad_nodes(bvh.node_count)[:, None]
    v0 = _pad_nodes(tris.v0)
    e1 = _pad_nodes(tris.e1)
    e2 = _pad_nodes(tris.e2)

    grid = rows // packet_rows
    ray_spec = pl.BlockSpec((packet_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    out_shape = [
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),   # t
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),     # prim
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),   # u
        jax.ShapeDtypeStruct((rows, LANES), jnp.float32),   # v
    ]
    t, prim, u, v = pl.pallas_call(
        _packet_kernel(any_hit),
        grid=(grid,),
        in_specs=[full] * 8 + [ray_spec] * 8,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
            pltpu.VMEM((packet_rows, LANES), jnp.float32),
            pltpu.VMEM((packet_rows, LANES), jnp.float32),
            pltpu.VMEM((packet_rows, LANES), jnp.float32),
        ],
        interpret=not _COMPILED,
    )(nmin, nmax, skip, first, count, v0, e1, e2,
      ox, oy, oz, dx, dy, dz, tmin, tmax)

    flat = lambda x: x.reshape(-1)[:r]
    return flat(t), flat(prim), flat(u), flat(v)
