"""Per-lane (SIMT-on-VPU) two-level traversal kernels.

Every ray owns its traversal state; all control flow is vector selects
— no scalar steering, the measured floor of the packet kernels on
incoherent rays (NOTES.md round-3 study).  Data layout and cut:
accel/subtrees.py (PerLaneBVH).

Three pieces:

  * `topscan_rows` — each lane slab-tests ALL subtree root boxes
    (scalar-broadcast, no gathers) and takes its nearest
    not-yet-processed subtree: lexicographic (t_near, id) ordering
    gives front-to-back rounds with early termination.
  * `subtree_walk_rows` — subtree-pure 1024-ray rows walk their
    subtree per-lane: threaded (skip-link) node steps and triangle
    steps interleave per lane; node/tri fetches are sublane-broadcast
    lane-gathers (tpu.dynamic_gather) from the row's 2-page tables.
  * `perlane_trace` — the XLA rounds driver: top scan, regroup rays by
    subtree (sort + per-subtree row padding), walk, merge, repeat
    until every ray is done (closest: next subtree entry beyond best_t;
    any-hit: first hit).

Reference parity: replaces OptiX rtTrace scheduling for incoherent
workloads (pathtracing.cu:240-344 bounce rays); Moller-Trumbore and
the slab test match trace/intersect.py bit-for-bit in structure.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from evplp_tpu.accel.subtrees import DONE, LEAF_TAG, PerLaneBVH

LANES = 128
ROW = 1024                    # rays per row: 8 sublanes x 128 lanes
# plain python floats: materialized inside each trace so Pallas kernels
# don't capture module-level device constants
NEG = -3.0e38
BIG = 3.0e38
WALK_CHUNK = 8                # unified steps between liveness checks

_INTERPRET = None             # None -> auto: interpret on CPU


def set_interpret(interpret: bool | None) -> None:
    global _INTERPRET
    _INTERPRET = interpret


def _interp() -> bool:
    if _INTERPRET is not None:
        return _INTERPRET
    return jax.default_backend() == "cpu"


def _safe_inv(d):
    return jnp.where(jnp.abs(d) > 1e-20, 1.0 / d,
                     jnp.where(d >= 0, BIG, NEG))


# ---------------------------------------------------------------------------
# top scan
# ---------------------------------------------------------------------------

def _topscan_kernel(n_sub: int):
    def kernel(box_ref, ray_ref, last_tn_ref, last_sid_ref, best_ref,
               sid_out, tn_out):
        o = (ray_ref[0, 0], ray_ref[0, 1], ray_ref[0, 2])
        inv = (ray_ref[0, 3], ray_ref[0, 4], ray_ref[0, 5])  # 1/d precomp
        last_tn = last_tn_ref[0]
        last_sid = last_sid_ref[0]
        best_t = best_ref[0]

        def step(s, carry):
            nxt_tn, nxt_sid = carry
            t0x = (box_ref[s, 0] - o[0]) * inv[0]
            t1x = (box_ref[s, 3] - o[0]) * inv[0]
            t0y = (box_ref[s, 1] - o[1]) * inv[1]
            t1y = (box_ref[s, 4] - o[1]) * inv[1]
            t0z = (box_ref[s, 2] - o[2]) * inv[2]
            t1z = (box_ref[s, 5] - o[2]) * inv[2]
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                         jnp.maximum(t0y, t1y)),
                             jnp.maximum(t0z, t1z))
            hit = (tn <= tf) & (tf >= 0.0) & (tn <= best_t)
            # strictly after (last_tn, last_sid), lexicographic
            after = (tn > last_tn) | ((tn == last_tn) & (s > last_sid))
            better = (tn < nxt_tn) | ((tn == nxt_tn) & (s < nxt_sid))
            take = hit & after & better
            return (jnp.where(take, tn, nxt_tn),
                    jnp.where(take, s, nxt_sid))

        init = (jnp.full_like(best_t, BIG),
                jnp.full_like(last_sid, n_sub))
        nxt_tn, nxt_sid = jax.lax.fori_loop(0, n_sub, step, init)
        none = nxt_sid >= n_sub
        sid_out[0] = jnp.where(none, -1, nxt_sid)
        tn_out[0] = jnp.where(none, BIG, nxt_tn)

    return kernel


@partial(jax.jit, static_argnames=("n_sub",))
def topscan_rows(boxes, rays, last_tn, last_sid, best_t, n_sub: int):
    """Nearest unprocessed subtree per lane.

    boxes (S, 8) f32 SMEM; rays (R, 6, 8, 128): o xyz + 1/d xyz planes;
    last_tn/best_t (R, 8, 128) f32; last_sid (R, 8, 128) i32.
    Returns (sid, tn): (R, 8, 128) i32 / f32; sid == -1 -> none left."""
    r = rays.shape[0]
    grid = (r,)
    return pl.pallas_call(
        _topscan_kernel(n_sub),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 6, 8, LANES), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0)),
                   pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((r, 8, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((r, 8, LANES), jnp.float32)),
        interpret=_interp(),
    )(boxes, rays, last_tn, last_sid, best_t)


# ---------------------------------------------------------------------------
# subtree walk
# ---------------------------------------------------------------------------

def _fetch(pages, f, idx, idx_hi):
    """Per-lane 2-page table read: pages (16|20, 128) loaded value,
    field f at local index idx (8,128) in [0, 256)."""
    lo = jnp.take_along_axis(
        jnp.broadcast_to(pages[2 * f:2 * f + 1], (8, LANES)),
        idx, axis=1)
    hi = jnp.take_along_axis(
        jnp.broadcast_to(pages[2 * f + 1:2 * f + 2], (8, LANES)),
        idx, axis=1)
    return jnp.where(idx_hi, hi, lo)


def _walk_kernel(any_hit: bool, max_steps: int):
    def kernel(sid_ref, node_ref, tri_ref, ray_ref,
               t_out, p_out, u_out, v_out):
        i = pl.program_id(0)
        sid = sid_ref[i]
        nodes = node_ref[sid]        # (16, 128)
        tris = tri_ref[sid]          # (20, 128)

        o = (ray_ref[0, 0], ray_ref[0, 1], ray_ref[0, 2])
        d = (ray_ref[0, 3], ray_ref[0, 4], ray_ref[0, 5])
        t_min = ray_ref[0, 6]
        best0 = ray_ref[0, 7]
        inv = (_safe_inv(d[0]), _safe_inv(d[1]), _safe_inv(d[2]))

        shape = o[0].shape
        zero_i = jnp.zeros(shape, jnp.int32)

        def unified_step(c):
            nid, tri_i, tri_n, best_t, best_p, best_u, best_v = c
            in_tri = tri_n > 0

            # ---- node fetch + slab ----
            nidc = jnp.minimum(nid, 255)
            nhi = nidc >= LANES
            nl = nidc & (LANES - 1)
            nf = [_fetch(nodes, f, nl, nhi) for f in range(8)]
            t0x = (nf[0] - o[0]) * inv[0]
            t1x = (nf[3] - o[0]) * inv[0]
            t0y = (nf[1] - o[1]) * inv[1]
            t1y = (nf[4] - o[1]) * inv[1]
            t0z = (nf[2] - o[2]) * inv[2]
            t1z = (nf[5] - o[2]) * inv[2]
            tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                         jnp.minimum(t0y, t1y)),
                             jnp.minimum(t0z, t1z))
            tf_ = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                          jnp.maximum(t0y, t1y)),
                              jnp.maximum(t0z, t1z))
            bhit = (tn <= tf_) & (tf_ >= 0.0) & (tn <= best_t)
            f6 = nf[6].astype(jnp.int32)
            skip = nf[7].astype(jnp.int32)
            is_leaf = f6 >= LEAF_TAG
            payload = f6 - LEAF_TAG
            first = payload >> 6
            count = payload & 63

            at_node = ~in_tri & (nid < DONE)
            enter_leaf = at_node & bhit & is_leaf
            step_in = at_node & bhit & ~is_leaf
            step_skip = at_node & ~bhit

            # ---- tri fetch + Moller ----
            tic = jnp.minimum(tri_i, 255)
            thi = tic >= LANES
            tl = tic & (LANES - 1)
            tfld = [_fetch(tris, f, tl, thi) for f in range(10)]
            v0x, v0y, v0z = tfld[0], tfld[1], tfld[2]
            e1x, e1y, e1z = tfld[3], tfld[4], tfld[5]
            e2x, e2y, e2z = tfld[6], tfld[7], tfld[8]
            px = d[1] * e2z - d[2] * e2y
            py = d[2] * e2x - d[0] * e2z
            pz = d[0] * e2y - d[1] * e2x
            det = e1x * px + e1y * py + e1z * pz
            inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
            sx, sy, sz = o[0] - v0x, o[1] - v0y, o[2] - v0z
            uu = (sx * px + sy * py + sz * pz) * inv_det
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            vv = (d[0] * qx + d[1] * qy + d[2] * qz) * inv_det
            tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
            thit = (in_tri & (jnp.abs(det) > 1e-9) & (uu >= 0.0)
                    & (vv >= 0.0) & (uu + vv <= 1.0)
                    & (tt > t_min) & (tt < best_t))
            best_t = jnp.where(thit, tt, best_t)
            best_p = jnp.where(thit, tfld[9].astype(jnp.int32), best_p)
            best_u = jnp.where(thit, uu, best_u)
            best_v = jnp.where(thit, vv, best_v)

            # ---- next state ----
            tri_n = jnp.where(in_tri, tri_n - 1,
                              jnp.where(enter_leaf, count, zero_i))
            tri_i = jnp.where(in_tri, tri_i + 1,
                              jnp.where(enter_leaf, first, zero_i))
            nid = jnp.where(enter_leaf | step_skip, skip,
                            jnp.where(step_in, nid + 1, nid))
            return (nid, tri_i, tri_n, best_t, best_p, best_u, best_v)

        def alive(c):
            nid, _, tri_n, _, best_p, _, _ = c
            live = (nid < DONE) | (tri_n > 0)
            if any_hit:
                live = live & (best_p < 0)
            return live

        def chunk(c):
            step, st = c
            def body(_, s):
                return unified_step(s)
            st = jax.lax.fori_loop(0, WALK_CHUNK, body, st)
            return (step + WALK_CHUNK, st)

        def cond(c):
            step, st = c
            return (step < max_steps) & jnp.any(alive(st))

        p0 = jnp.full(shape, -1, jnp.int32)
        z = jnp.zeros(shape, jnp.float32)
        st0 = (zero_i, zero_i, zero_i, best0, p0, z, z)
        _, st = jax.lax.while_loop(cond, chunk, (jnp.int32(0), st0))
        _, _, _, best_t, best_p, best_u, best_v = st
        t_out[0] = best_t
        p_out[0] = best_p
        u_out[0] = best_u
        v_out[0] = best_v

    return kernel


@partial(jax.jit, static_argnames=("any_hit", "max_steps"))
def subtree_walk_rows(sid, sub_nodes, sub_tris, rays,
                      any_hit: bool = False, max_steps: int = 2048):
    """Walk each row's subtree per-lane.

    sid (R,) i32 SMEM — subtree id per 1024-ray row;
    rays (R, 8, 8, 128): o xyz, d xyz, t_min, best_t planes.
    Returns (t, prim, u, v): (R, 8, 128) planes; prim -1 = no
    improvement over the incoming best_t."""
    r = rays.shape[0]
    grid = (r,)
    out = pl.pallas_call(
        _walk_kernel(any_hit, max_steps),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 8, LANES), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0)),
                   pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0)),
                   pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0)),
                   pl.BlockSpec((1, 8, LANES), lambda i: (i, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((r, 8, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((r, 8, LANES), jnp.int32),
                   jax.ShapeDtypeStruct((r, 8, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((r, 8, LANES), jnp.float32)),
        interpret=_interp(),
    )(sid, sub_nodes, sub_tris, rays)
    return out


# ---------------------------------------------------------------------------
# rounds driver
# ---------------------------------------------------------------------------

def _planes(x, r):
    return x.reshape(r, 8, LANES)


@partial(jax.jit, static_argnames=("n_sub", "any_hit"))
def perlane_trace(plb: PerLaneBVH, o, d, t_min, t_max, n_sub: int,
                  any_hit: bool = False):
    """Closest-hit (or any-hit) trace via per-lane two-level rounds.

    o, d: (N, 3) with N a multiple of 1024; t_min/t_max (N,).
    Returns (t, prim, u, v) with prim == -1 for miss; t == t_max there."""
    n = o.shape[0]
    assert n % ROW == 0, n
    r = n // ROW
    s = n_sub
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (n,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    inv = _safe_inv(d)
    top_rays = jnp.stack(
        [_planes(o[:, 0], r), _planes(o[:, 1], r), _planes(o[:, 2], r),
         _planes(inv[:, 0], r), _planes(inv[:, 1], r),
         _planes(inv[:, 2], r)], axis=1)

    # flat per-ray state
    best_t = jnp.asarray(t_max, jnp.float32)
    best_p = jnp.full((n,), -1, jnp.int32)
    best_u = jnp.zeros((n,), jnp.float32)
    best_v = jnp.zeros((n,), jnp.float32)
    last_tn = jnp.full((n,), NEG, jnp.float32)
    last_sid = jnp.full((n,), -1, jnp.int32)
    live = jnp.asarray(t_max, jnp.float32) > t_min

    # padded regroup geometry: worst case every subtree partially fills
    # its last row
    rp = r + s
    ray_rows = jnp.concatenate(
        [o, d, t_min[:, None], jnp.zeros((n, 1), jnp.float32)], axis=1)

    def round_body(carry):
        best_t, best_p, best_u, best_v, last_tn, last_sid, live, _ = carry

        sid, tn = topscan_rows(plb.sub_boxes, top_rays,
                               _planes(last_tn, r),
                               _planes(last_sid, r),
                               _planes(best_t, r), n_sub=s)
        sid = sid.reshape(n)
        tn = tn.reshape(n)
        go = live & (sid >= 0) & (tn <= best_t)

        # regroup: sort by subtree (dead -> S), pad each subtree to a
        # row multiple so rows are subtree-pure
        key = jnp.where(go, sid, s)
        order = jnp.argsort(key, stable=True)
        ksort = key[order]
        counts = jnp.zeros((s + 1,), jnp.int32).at[ksort].add(1)
        padded = -(-counts[:s] // ROW) * ROW
        poff = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                jnp.cumsum(padded)])
        start = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             jnp.cumsum(counts)])[:-1]
        rank = jnp.arange(n, dtype=jnp.int32) - start[ksort]
        pos = jnp.where(ksort < s, poff[jnp.minimum(ksort, s - 1)] + rank,
                        rp * ROW - 1)  # dead rays parked on the last slot

        # padded row tables: rows' subtree ids
        row_sid = jnp.searchsorted(
            poff[1:], jnp.arange(rp, dtype=jnp.int32) * ROW,
            side="right").astype(jnp.int32)
        row_sid = jnp.minimum(row_sid, s - 1)

        # scatter ray rows into the padded buffer (pad slots: dead rays)
        buf = jnp.zeros((rp * ROW, 8), jnp.float32)
        buf = buf.at[:, 6].set(1.0)          # t_min=1 > best_t=0: no-op
        rows_in = ray_rows.at[:, 7].set(jnp.where(go, best_t, 0.0))
        buf = buf.at[pos].set(rows_in[order])

        wt, wp, wu, wv = subtree_walk_rows(
            row_sid, plb.sub_nodes, plb.sub_tris,
            buf.reshape(rp, ROW, 8).transpose(0, 2, 1)
               .reshape(rp, 8, 8, LANES),
            any_hit=any_hit)
        # gather results back to ray order
        flat = lambda x: x.reshape(rp, 8 * LANES).reshape(rp * ROW)
        res_t = flat(wt)[pos]
        res_p = flat(wp)[pos]
        res_u = flat(wu)[pos]
        res_v = flat(wv)[pos]
        inv_order = jnp.zeros_like(order).at[order].set(
            jnp.arange(n, dtype=order.dtype))
        res_t = res_t[inv_order]
        res_p = res_p[inv_order]
        res_u = res_u[inv_order]
        res_v = res_v[inv_order]

        better = go & (res_p >= 0)
        best_t = jnp.where(better, res_t, best_t)
        best_p = jnp.where(better, res_p, best_p)
        best_u = jnp.where(better, res_u, best_u)
        best_v = jnp.where(better, res_v, best_v)

        last_tn = jnp.where(go, tn, last_tn)
        last_sid = jnp.where(go, sid, last_sid)
        live = go
        if any_hit:
            live = live & (best_p < 0)
        return (best_t, best_p, best_u, best_v, last_tn, last_sid, live,
                jnp.any(live))

    def cond(carry):
        return carry[-1]

    carry = (best_t, best_p, best_u, best_v, last_tn, last_sid, live,
             jnp.any(live))
    carry = jax.lax.while_loop(cond, round_body, carry)
    best_t, best_p, best_u, best_v = carry[:4]
    return best_t, best_p, best_u, best_v
