"""Ray-triangle intersection + stackless BVH traversal (pure JAX).

TPU-native replacement for OptiX rtTrace + the per-primitive programs
(reference: reflectcuts/realtimetechniques/triangleintersect.cu and the
Trbvh accel).  Rays are SoA batches; traversal is a lax.while_loop over a
threaded (skip-pointer) BVH — no stack, loop state is (node, best_t, prim).

Directions may be unnormalized: t is measured in units of |d|, which the
reference exploits for segment shadow rays (origin=photon, dir=-v12,
t in (eps, 1-eps); lighttracing.cu:292).

This module is the readable/correctness implementation and the fallback for
CPU tests; the Pallas packet kernel (trace/packet.py) is the TPU hot path.
"""
from __future__ import annotations

import os as _os
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import jax.tree_util as jtu

from evplp_tpu.accel.bvh import BVH

TRI_EPS = 1e-9          # determinant cutoff
BIG = jnp.float32(3.4e38)

# Scenes at or below this triangle count skip the BVH entirely: a dense
# rays-x-triangles test is pure VPU math that XLA fuses into one pass —
# orders of magnitude faster on TPU than per-lane while_loop traversal.
# Triangles are processed in chunks to bound memory.
BRUTE_FORCE_MAX_TRIS = 2048
# Dense-test orientation: triangles on SUBLANES (granularity 8 — a 62-tri
# scene pads to 64, not to a 128-lane row), rays on LANES.  Work arrays are
# (tri_chunk, ray_block).
BRUTE_TRI_CHUNK = 128     # max sublane extent per step
BRUTE_RAY_BLOCK = 65536   # lanes per scan step: bounds (tris x rays) temps


@dataclass(frozen=True)
class Triangles:
    """Leaf-ordered triangle SoA (permuted by BVH build).

    v0: (T, 3); e1 = v1 - v0; e2 = v2 - v0; n: (T, 3) geometric normal
    normalize(cross(e1, e2)) (winding order, deferred.geom:16-18).
    """
    v0: jnp.ndarray
    e1: jnp.ndarray
    e2: jnp.ndarray
    n: jnp.ndarray

    def tree_flatten(self):  # pragma: no cover
        return (self.v0, self.e1, self.e2, self.n), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):  # pragma: no cover
        return cls(*leaves)


jtu.register_pytree_node(Triangles, Triangles.tree_flatten, Triangles.tree_unflatten)


@dataclass(frozen=True)
class Hit:
    """Closest-hit result. prim == -1 means miss. t in |d| units."""
    t: jnp.ndarray
    prim: jnp.ndarray
    u: jnp.ndarray
    v: jnp.ndarray

    @property
    def valid(self):
        return self.prim >= 0

    def tree_flatten(self):  # pragma: no cover
        return (self.t, self.prim, self.u, self.v), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):  # pragma: no cover
        return cls(*leaves)


jtu.register_pytree_node(Hit, Hit.tree_flatten, Hit.tree_unflatten)


def _ray_tri(o, d, v0, e1, e2):
    """Moller-Trumbore, double-sided. Returns (t, u, v, ok-geometry)."""
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > TRI_EPS, 1.0 / det, 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    ok = (jnp.abs(det) > TRI_EPS) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    return t, u, v, ok


# triangle-row streaming (HBM-resident tri rows, per-drain-slot DMA):
# "auto" = only past the fully-resident ceiling; "1" = always; "0" = never
STREAM_TRIS = _os.environ.get("EVPLP_STREAM_TRIS", "auto")
# fully-VMEM-resident ceilings (measured, v5e 128 MB VMEM: 414k plain =
# 132.5 MB -> OOM; fused halves node rows)
RESIDENT_CAP_FUSED = 1_600_000
RESIDENT_CAP_PLAIN = 300_000
# streamed ceiling is node-bound: (N, 8) f32 bounds pad to 128 lanes in
# VMEM => ~512 B/node, nodes ~= tris/17 at leaf 42 => ~30 B/tri
STREAM_CAP = 3_200_000
# packed16 node rows (16 nodes per 128-lane row, BVH.packed16) cut node
# VMEM 16x => ~2 B/tri resident with streamed tri rows
PACKED16_CAP = 20_000_000


def _stream_tris(tris: Triangles, bvh) -> bool:
    if STREAM_TRIS == "0" or not bvh.fused_nodes:
        return False
    if STREAM_TRIS == "1":
        return True
    return tris.v0.shape[0] > RESIDENT_CAP_FUSED


def _use_packet(tris: Triangles, bvh) -> bool:
    """Large-scene strategy selection (trace-time static): the Pallas packet
    kernel (packed VMEM layout) on TPU-like backends when the BVH carries
    the packed mirror, vmapped while_loop traversal elsewhere (CPU tests,
    giant scenes).  The cap is VMEM-resident scene data (tri rows +
    bounds + meta, plus compiler temporaries): ~300k triangles compiles
    inside v5e's 128 MB VMEM; 414k measured 132.5 MB (OOM).  Fused node
    rows lift it to ~1.6M, and HBM-streamed tri rows past that leave only
    the node bounds resident (~3.2M)."""
    if _stream_tris(tris, bvh):
        cap = PACKED16_CAP if bvh.packed16 else STREAM_CAP
    else:
        cap = RESIDENT_CAP_FUSED if bvh.fused_nodes else RESIDENT_CAP_PLAIN
    if tris.v0.shape[0] > cap or not bvh.has_packed:
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _slab_test(o, inv_d, nmin, nmax, t_max):
    """Ray/AABB slab test; robust to inf*0 via explicit min/max order."""
    t0 = (nmin - o) * inv_d
    t1 = (nmax - o) * inv_d
    tsm = jnp.minimum(t0, t1)
    tbg = jnp.maximum(t0, t1)
    t_near = jnp.max(tsm, axis=-1)
    t_far = jnp.min(tbg, axis=-1)
    return (t_near <= t_far) & (t_far >= 0.0) & (t_near <= t_max)


def _traverse_one(tris: Triangles, bvh: BVH, o, d, t_min, t_max,
                  any_hit: bool, leaf_size: int):
    """Single-ray traversal; vmapped by the public entry points."""
    num_nodes = bvh.node_min.shape[0]
    inv_d = jnp.where(jnp.abs(d) > 1e-20, 1.0 / d, jnp.where(d >= 0, BIG, -BIG))

    def cond(state):
        node, t, prim, _, _ = state
        return node < num_nodes

    def body(state):
        node, t, prim, u, v = state
        count = bvh.node_count[node]
        first = bvh.node_first[node]
        is_leaf = count > 0

        # --- leaf: intersect up to leaf_size triangles (masked) ---
        def leaf_step(i, carry):
            t, prim, u, v = carry
            idx = jnp.minimum(first + i, tris.v0.shape[0] - 1)
            tt, uu, vv, ok = _ray_tri(o, d, tris.v0[idx], tris.e1[idx], tris.e2[idx])
            ok = ok & (i < count) & is_leaf & (tt > t_min) & (tt < t)
            return (
                jnp.where(ok, tt, t),
                jnp.where(ok, idx, prim),
                jnp.where(ok, uu, u),
                jnp.where(ok, vv, v),
            )

        t, prim, u, v = jax.lax.fori_loop(0, leaf_size, leaf_step, (t, prim, u, v))

        # --- internal: descend on bbox hit, else skip ---
        bbox_hit = _slab_test(o, inv_d, bvh.node_min[node], bvh.node_max[node], t)
        next_node = jnp.where(is_leaf | ~bbox_hit, bvh.node_skip[node], node + 1)
        if any_hit:
            next_node = jnp.where(prim >= 0, num_nodes, next_node)
        return (next_node, t, prim, u, v)

    init = (jnp.int32(0), t_max, jnp.int32(-1), jnp.float32(0), jnp.float32(0))
    _, t, prim, u, v = jax.lax.while_loop(cond, body, init)
    return t, prim, u, v


def _ray_tri_components(o, d, v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z):
    """Moller-Trumbore expanded to scalar components.

    Triangle components are (C, 1) columns (sublanes), ray components (1, R)
    rows (lanes): every temporary is a fused (C, R) VPU tile; jnp.cross on
    stacked 3-vectors would materialize (C, R, 3) and blow HBM."""
    ox, oy, oz = o[0][None, :], o[1][None, :], o[2][None, :]
    dx, dy, dz = d[0][None, :], d[1][None, :], d[2][None, :]

    # pvec = d x e2
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > TRI_EPS, 1.0 / det, 0.0)

    tx = ox - v0x
    ty = oy - v0y
    tz = oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det

    # qvec = tvec x e1
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det

    ok = (jnp.abs(det) > TRI_EPS) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
    return t, u, v, ok


def _tri_chunks(tris: Triangles):
    """Triangle component columns, chunked along sublanes.

    Chunk extent = min(BRUTE_TRI_CHUNK, T rounded up to 8): a 62-triangle
    scene becomes ONE 64-row chunk (3% pad) instead of a 128-lane row
    (106% pad)."""
    num_tris = tris.v0.shape[0]
    chunk = min(BRUTE_TRI_CHUNK, -(-num_tris // 8) * 8)
    pad = (-num_tris) % chunk
    comps = []
    for arr in (tris.v0, tris.e1, tris.e2):
        a = jnp.pad(arr, ((0, pad), (0, 0)))
        n_chunks = a.shape[0] // chunk
        for c in range(3):
            comps.append(a[:, c].reshape(n_chunks, chunk, 1))
    return comps, num_tris, chunk


def _ray_blocks(o, d, t_min, t_max):
    r = o.shape[0]
    block = min(BRUTE_RAY_BLOCK, -(-r // 128) * 128)
    pad = (-r) % block
    o = jnp.pad(o, ((0, pad), (0, 0)))
    d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
    t_min = jnp.pad(t_min, (0, pad))
    t_max = jnp.pad(t_max, (0, pad))
    nb = (r + pad) // block
    comps = [o.reshape(nb, block, 3)[:, :, c] for c in range(3)]
    comps += [d.reshape(nb, block, 3)[:, :, c] for c in range(3)]
    return (comps, t_min.reshape(nb, block), t_max.reshape(nb, block),
            r, block)


def _closest_brute_chunked(tris: Triangles, o, d, t_min, t_max):
    """Dense closest hit: scan over ray blocks x triangle chunks.
    The hot path for small scenes; pure fused VPU math."""
    comps, num_tris, chunk = _tri_chunks(tris)
    rcomp, tminb, tmaxb, r, block = _ray_blocks(o, d, t_min, t_max)
    tri_local = jnp.arange(chunk, dtype=jnp.int32)[:, None]

    def ray_step(_, xs):
        ox, oy, oz, dx, dy, dz, tmin_, tmax_ = xs
        o_ = (ox, oy, oz)
        d_ = (dx, dy, dz)

        def tri_step(carry, cxs):
            best_t, best_prim, best_u, best_v, base = carry
            t, u, v, ok = _ray_tri_components(o_, d_, *cxs)
            ok = ok & (t > tmin_[None, :]) & (t < tmax_[None, :]) \
                & ((base + tri_local) < num_tris)
            t = jnp.where(ok, t, BIG)
            j = jnp.argmin(t, axis=0)                      # over tris
            cols = jnp.arange(block)
            cand_t = t[j, cols]
            better = cand_t < best_t
            return (
                jnp.where(better, cand_t, best_t),
                jnp.where(better, base + j.astype(jnp.int32), best_prim),
                jnp.where(better, u[j, cols], best_u),
                jnp.where(better, v[j, cols], best_v),
                base + chunk,
            ), None

        init = (jnp.full((block,), BIG), jnp.full((block,), -1, jnp.int32),
                jnp.zeros((block,)), jnp.zeros((block,)), jnp.int32(0))
        (t, prim, u, v, _), _ = jax.lax.scan(tri_step, init, comps)
        hit = prim >= 0
        return None, (jnp.where(hit, t, tmax_), prim, u, v)

    _, (t, prim, u, v) = jax.lax.scan(ray_step, None, (*rcomp, tminb, tmaxb))
    return (t.reshape(-1)[:r], prim.reshape(-1)[:r],
            u.reshape(-1)[:r], v.reshape(-1)[:r])


def _any_brute_chunked(tris: Triangles, o, d, t_min, t_max):
    comps, num_tris, chunk = _tri_chunks(tris)
    rcomp, tminb, tmaxb, r, block = _ray_blocks(o, d, t_min, t_max)
    tri_local = jnp.arange(chunk, dtype=jnp.int32)[:, None]

    def ray_step(_, xs):
        ox, oy, oz, dx, dy, dz, tmin_, tmax_ = xs
        o_ = (ox, oy, oz)
        d_ = (dx, dy, dz)

        def tri_step(carry, cxs):
            occ, base = carry
            t, _, _, ok = _ray_tri_components(o_, d_, *cxs)
            ok = ok & (t > tmin_[None, :]) & (t < tmax_[None, :]) \
                & ((base + tri_local) < num_tris)
            return (occ | jnp.any(ok, axis=0), base + chunk), None

        def run(_):
            (occ, _), _ = jax.lax.scan(
                tri_step, (jnp.zeros((block,), bool), jnp.int32(0)), comps)
            return occ

        # record-level block cull (VERDICT r4 #4): pre-culled shadow
        # segments arrive with an empty (t_min, t_max) interval; when a
        # whole ray block is dead (VSL records facing away from entire
        # screen regions — measured 43% of blocks at protocol scale), skip
        # its triangle loop outright instead of computing a masked zero.
        occ = jax.lax.cond(jnp.any(tmax_ > tmin_), run,
                           lambda _: jnp.zeros((block,), bool), None)
        return None, occ

    _, occ = jax.lax.scan(ray_step, None, (*rcomp, tminb, tmaxb))
    return occ.reshape(-1)[:r]


# screen-tile swizzle: a packet of consecutive rays becomes a compact
# SWIZZLE_TH x SWIZZLE_TW pixel block instead of a thin raster strip, which
# shrinks each packet's BVH footprint ~2-4x (pure reshape/transpose, no
# gather). 64*128 = 8192 rays = one packet at the default kernel shape.
SWIZZLE_TH = 64
SWIZZLE_TW = 128


def _swizzle(x, ht, w):
    x = x.reshape((ht // SWIZZLE_TH, SWIZZLE_TH, w // SWIZZLE_TW,
                   SWIZZLE_TW) + x.shape[1:])
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape((ht * w,) + x.shape[4:])


def _unswizzle(x, ht, w):
    x = x.reshape((ht // SWIZZLE_TH, w // SWIZZLE_TW, SWIZZLE_TH,
                   SWIZZLE_TW) + x.shape[1:])
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape((ht * w,) + x.shape[4:])


# Incoherent-ray sort key shape (A/B-tunable via env; see bench notes):
# SORT_BITS origin-cell bits per axis, optionally Morton-interleaved.
# Swept on bounce-2 distributions at 102k tris (same-session): bits
# 2/3/4 = 373/359/355 ms per 1M-ray closest, morton interleave neutral
# — the packet working set is direction-divergence-bound, so the key
# shape is worth ~5% and no more.
SORT_BITS = int(_os.environ.get("EVPLP_SORT_BITS", "4"))
SORT_MORTON = _os.environ.get("EVPLP_SORT_MORTON", "0") not in ("0", "")
# Direction-quantization bits per axis BETWEEN the octant and the origin
# cell: packets of a (octant, |dir| bucket) share a tighter direction
# CONE.  MEASURED-REJECTED (probe_dq sandwich, NOTES.md, 1M bounce rays
# at 147k tris: 88.6 / 221.9 / 93.0 ms for dq 0/2/0) — tightening the
# cone fragments origin runs so badly that each packet's spatial
# footprint explodes; origin coherence is worth more than direction
# coherence at every granularity past the octant.  Default 0.
SORT_DQ = int(_os.environ.get("EVPLP_SORT_DQ", "0"))
# all-dead lanes sort past any real key (octant 3 + 3*dq + 3*bits < 28);
# the env-derived bit budget must fit or live keys would exceed the dead
# key and silently break the dead-lane tail clustering
if not (0 <= SORT_DQ and 0 <= SORT_BITS
        and 3 + 3 * SORT_DQ + 3 * SORT_BITS < 28):
    raise ValueError(
        f"EVPLP_SORT_BITS={SORT_BITS} / EVPLP_SORT_DQ={SORT_DQ}: sort key "
        "needs 3 + 3*dq + 3*bits < 28 bits (dead-lane key budget)")
_DEAD_KEY = jnp.int32(1) << 28


def _dq_bits(d):
    """(R,) direction-magnitude bucket code, 3*SORT_DQ bits."""
    adn = jnp.abs(d) * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(d * d, axis=-1, keepdims=True), 1e-30))
    lv = 1 << SORT_DQ
    q = jnp.clip((adn * lv).astype(jnp.int32), 0, lv - 1)
    return (q[:, 0] << (2 * SORT_DQ)) | (q[:, 1] << SORT_DQ) | q[:, 2]


def _sorted_packet_trace(bvh: BVH, o, d, t_min, t_max, any_hit: bool,
                         stream: bool = False):
    """Packet trace for INCOHERENT rays: sort by (direction octant, coarse
    origin cell) so each packet's BVH working set collapses.

    Unsorted incoherent packets effectively sweep most of the tree per
    packet (measured 1.8 Mray/s at 102k tris); sorted packets trace at
    ~14 Mray/s and the whole permutation pipeline (key + argsort + one
    row-gather in + one row-gather out) costs ~35 ms per 1M rays — a
    net ~4.8x.  Gathers go through ONE packed (R, 8) row gather: eight
    separate field gathers measured 6x slower.
    """
    r = o.shape[0]
    lo = bvh.node_min[0]
    inv_ext = 1.0 / jnp.maximum(bvh.node_max[0] - lo, 1e-6)

    bits = SORT_BITS
    cell = jnp.clip(((o - lo) * inv_ext * (1 << bits)).astype(jnp.int32),
                    0, (1 << bits) - 1)
    octant = ((d[:, 0] < 0).astype(jnp.int32) * 4
              + (d[:, 1] < 0).astype(jnp.int32) * 2
              + (d[:, 2] < 0).astype(jnp.int32))
    if SORT_MORTON:
        # Morton-interleave the cell bits: nearby origins share packets
        # at every granularity instead of only along x-major strips
        code = jnp.zeros_like(cell[:, 0])
        for b in range(bits):
            code = (code
                    | (((cell[:, 0] >> b) & 1) << (3 * b + 2))
                    | (((cell[:, 1] >> b) & 1) << (3 * b + 1))
                    | (((cell[:, 2] >> b) & 1) << (3 * b)))
    else:
        code = ((cell[:, 0] << (2 * bits)) | (cell[:, 1] << bits)
                | cell[:, 2])
    if SORT_DQ:
        code = (_dq_bits(d) << (3 * bits)) | code
    key = (octant << (3 * bits + 3 * SORT_DQ)) | code
    # dead lanes (empty interval: terminated paths, pre-culled segments)
    # sort to the END so they cluster into all-dead packets that exit the
    # traversal after ~1 iteration — lane compaction without the
    # gather/scatter cost (their per-lane results are unchanged: a pure
    # permutation, and empty intervals never hit)
    dead = t_max <= t_min
    key = jnp.where(dead, _DEAD_KEY, key)
    perm = jnp.argsort(key, stable=True)

    packed = jnp.concatenate(
        [o, d, t_min[:, None], t_max[:, None]], axis=1)[perm]
    t, prim, u, v = _packet_trace(
        bvh, packed[:, 0:3], packed[:, 3:6], packed[:, 6], packed[:, 7],
        any_hit, None, sorted_shape=True, stream=stream)

    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(r, dtype=perm.dtype))
    # prim is unsorted as int32 directly (one extra small gather): routing
    # it through a float32 bitcast would turn -1 into a NaN payload and
    # small ids into denormals, betting that no TPU pass canonicalizes them
    out = jnp.stack([t, u, v], axis=1)[inv]
    return out[:, 0], prim[inv], out[:, 1], out[:, 2]


def _shared_sort_key(bvh: BVH, o, da, dead):
    """(octant(da) | origin cell) sort key with dead lanes sent to the
    tail — the shared-permutation front end of _sorted_shared_trace
    (identical key math to _sorted_packet_trace)."""
    lo = bvh.node_min[0]
    inv_ext = 1.0 / jnp.maximum(bvh.node_max[0] - lo, 1e-6)
    bits = SORT_BITS
    cell = jnp.clip(((o - lo) * inv_ext * (1 << bits)).astype(jnp.int32),
                    0, (1 << bits) - 1)
    octant = ((da[:, 0] < 0).astype(jnp.int32) * 4
              + (da[:, 1] < 0).astype(jnp.int32) * 2
              + (da[:, 2] < 0).astype(jnp.int32))
    code = ((cell[:, 0] << (2 * bits)) | (cell[:, 1] << bits)
            | cell[:, 2])
    if SORT_DQ:
        code = (_dq_bits(da) << (3 * bits)) | code
    key = (octant << (3 * bits + 3 * SORT_DQ)) | code
    return jnp.where(dead, _DEAD_KEY, key)


def _sorted_shared_trace(bvh: BVH, o, da, t_min_a, t_max_a,
                         db, t_min_b, t_max_b, stream: bool = False):
    """Shared-permutation closest(A) + any-hit(B) as TWO separate packet
    dispatches (PT's per-vertex extension + NEE segment, which share an
    origin; a fused single-dispatch pair kernel was measured
    frame-neutral and removed — NOTES.md A/B log).

    One key + argsort + packed (R, 13) row gather + inverse permutation
    serve both traces (~25-30 ms/1M rays of permutation machinery saved
    per vertex vs two independent _sorted_packet_trace calls).  The B
    segments ride A's (octant, origin-cell) order: within an origin cell
    every segment points at the one area light, so their own octant term
    is nearly constant and the B packets stay working-set-coherent."""
    r = o.shape[0]
    # only lanes dead for BOTH rays join the all-dead tail packets; a
    # lane dead for one ray is an empty interval in that trace (free)
    dead = (t_max_a <= t_min_a) & (t_max_b <= t_min_b)
    perm = jnp.argsort(_shared_sort_key(bvh, o, da, dead), stable=True)

    packed = jnp.concatenate(
        [o, da, t_min_a[:, None], t_max_a[:, None],
         db, t_min_b[:, None], t_max_b[:, None]], axis=1)[perm]
    t, prim, u, v = _packet_trace(
        bvh, packed[:, 0:3], packed[:, 3:6], packed[:, 6], packed[:, 7],
        False, None, sorted_shape=True, stream=stream)
    _, prim_b, _, _ = _packet_trace(
        bvh, packed[:, 0:3], packed[:, 8:11], packed[:, 11], packed[:, 12],
        True, None, sorted_shape=True, stream=stream)

    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(r, dtype=perm.dtype))
    out = jnp.stack([t, u, v], axis=1)[inv]
    ints = jnp.stack([prim, (prim_b >= 0).astype(jnp.int32)], axis=1)[inv]
    return out[:, 0], ints[:, 0], out[:, 1], out[:, 2], ints[:, 1] > 0


@partial(jax.jit, static_argnames=("leaf_size",))
def closest_and_segment(tris: Triangles, bvh: BVH, o, d, t_min, t_max,
                        seg_to, seg_eps: float = 1e-5, seg_live=None,
                        leaf_size: int = 8):
    """Paired trace for PT's per-vertex workload: closest hit along d AND
    occlusion of the segment o -> seg_to (reference: the two rtTrace calls
    per vertex, pathtracing.cu:112-228 + 290-294), sharing one origin.

    On the packet path one sort permutation serves both ray sets
    (_sorted_shared_trace).  Elsewhere this is exactly intersect_closest
    + occluded_segment (same results, same semantics: seg_live=False
    segments are not traced and report True).  (A fully-fused
    single-dispatch pair kernel was built and measured frame-neutral —
    1.08x at kernel level, below the keep bar — and removed; NOTES.md
    round-3 A/B log.)"""
    r = o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    if (tris.v0.shape[0] > BRUTE_FORCE_MAX_TRIS and _use_packet(tris, bvh)):
        db = seg_to - o
        tmax_b = jnp.full((r,), 1.0 - seg_eps, jnp.float32)
        if seg_live is not None:
            tmax_b = jnp.where(seg_live, tmax_b, 0.0)
        t, prim, u, v, occ = _sorted_shared_trace(
            bvh, o, d, t_min, t_max,
            db, jnp.full((r,), seg_eps, jnp.float32), tmax_b,
            stream=_stream_tris(tris, bvh))
        return Hit(t=t, prim=prim, u=u, v=v), occ
    hit = intersect_closest(tris, bvh, o, d, t_min=t_min, t_max=t_max,
                            leaf_size=leaf_size, sort_rays=True)
    occ = occluded_segment(tris, bvh, o, seg_to, eps=seg_eps,
                           leaf_size=leaf_size, live=seg_live,
                           sort_rays=True)
    return hit, occ


@partial(jax.jit, static_argnames=("leaf_size", "force_sort"))
def closest_and_segment_carry(tris: Triangles, bvh: BVH, o, d, t_min, t_max,
                              seg_to, carry, seg_eps: float = 1e-5,
                              seg_live=None, leaf_size: int = 8,
                              force_sort: bool = False):
    """closest_and_segment with results LEFT IN SORTED ORDER and the
    caller's carry columns (R, K) riding the same row gather — PT's
    sorted-state-ACROSS-bounces mode: the per-vertex inverse permutation
    disappears and the caller scatters back to pixel order ONCE per
    frame via an index column it carries (roadmap 2a / VERDICT r4 #5).

    Returns (Hit, occluded, o_sorted, d_sorted, carry_sorted) — all five
    in one consistent order that is some permutation of the input order.
    Off the packet path (CPU tests, dense scenes) no sort happens and
    the input order IS that order; force_sort=True exercises the
    permutation logic on the fallback tracer (tests without a TPU)."""
    r = o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    packet = (tris.v0.shape[0] > BRUTE_FORCE_MAX_TRIS
              and _use_packet(tris, bvh))
    db = seg_to - o
    tmin_b = jnp.full((r,), seg_eps, jnp.float32)
    tmax_b = jnp.full((r,), 1.0 - seg_eps, jnp.float32)
    if seg_live is not None:
        tmax_b = jnp.where(seg_live, tmax_b, 0.0)
    if packet or force_sort:
        dead = (t_max <= t_min) & (tmax_b <= tmin_b)
        perm = jnp.argsort(_shared_sort_key(bvh, o, d, dead), stable=True)
        packed = jnp.concatenate(
            [o, d, t_min[:, None], t_max[:, None],
             db, tmin_b[:, None], tmax_b[:, None], carry], axis=1)[perm]
        o_s, d_s = packed[:, 0:3], packed[:, 3:6]
        if packet:
            stream = _stream_tris(tris, bvh)
            t, prim, u, v = _packet_trace(
                bvh, o_s, d_s, packed[:, 6], packed[:, 7], False, None,
                sorted_shape=True, stream=stream)
            _, prim_b, _, _ = _packet_trace(
                bvh, o_s, packed[:, 8:11], packed[:, 11], packed[:, 12],
                True, None, sorted_shape=True, stream=stream)
            occ = prim_b >= 0
        else:
            hit = intersect_closest(tris, bvh, o_s, d_s,
                                    t_min=packed[:, 6], t_max=packed[:, 7],
                                    leaf_size=leaf_size)
            t, prim, u, v = hit.t, hit.prim, hit.u, hit.v
            occ = occluded_segment(tris, bvh, o_s, o_s + packed[:, 8:11],
                                   eps=seg_eps, leaf_size=leaf_size,
                                   live=packed[:, 12] > 0.5)
        return (Hit(t=t, prim=prim, u=u, v=v), occ, o_s, d_s,
                packed[:, 13:])
    hit = intersect_closest(tris, bvh, o, d, t_min=t_min, t_max=t_max,
                            leaf_size=leaf_size, sort_rays=True)
    occ = occluded_segment(tris, bvh, o, seg_to, eps=seg_eps,
                           leaf_size=leaf_size, live=seg_live,
                           sort_rays=True)
    return hit, occ, o, d, carry


# packet kernel implementation switch (A/B): "packet3" = one grid step per
# ray block (default); "packet7" = two-level loop (tiny traversal body +
# burst drains — measured at parity, kept as the documented alternate;
# round-2/3 variants packet2/4/5/6 all measured flat and were pruned)
PACKET_IMPL = "packet3"
# packet shape knobs (A/B; defaults = packet3 module defaults)
PACKET_ROWS = int(_os.environ.get("EVPLP_PACKET_ROWS", "0"))
PACKET_NPACK = int(_os.environ.get("EVPLP_PACKET_NPACK", "0"))


# Sorted (incoherent) batches run 4096-ray packets: same-session sandwich
# A/B at the bounce-2 distribution, 102k tris: rows=32/npack=2 283 ms vs
# 355/357 ms control (rows=64) per 1M-ray closest — smaller packets
# shrink the per-packet BVH working-set union.  Coherent workloads
# measured flat across rows (round-2 sweep), so tiles keep rows=64.
SORTED_ROWS = 32
SORTED_NPACK = 2


def _packet_trace(bvh: BVH, o, d, t_min, t_max, any_hit: bool, tile_shape,
                  sorted_shape: bool = False, stream: bool = False):
    pm = None if bvh.slot_order else bvh.pk_prim_map
    if bvh.fused_nodes and PACKET_IMPL != "packet3":
        # only packet3 understands the fused node layout
        from evplp_tpu.trace.packet3 import packet3_trace
        kern = partial(packet3_trace, bvh.pk_tri_rows, bvh.pk_meta,
                       bvh.pk_bounds, pm, rpl=bvh.rpl, fused=True,
                       stream_tris=stream, packed16=bvh.packed16)
    elif PACKET_IMPL == "packet7":
        from evplp_tpu.trace.packet7 import packet7_trace
        kern = partial(packet7_trace, bvh.pk_tri_rows, bvh.pk_meta,
                       bvh.pk_bounds, pm, rpl=bvh.rpl)
    else:
        from evplp_tpu.trace.packet3 import packet3_trace
        kw = {}
        if sorted_shape:
            kw["rows"], kw["npack"] = SORTED_ROWS, SORTED_NPACK
        if PACKET_ROWS:
            kw["rows"] = PACKET_ROWS
        if PACKET_NPACK:
            kw["npack"] = PACKET_NPACK
        kern = partial(packet3_trace, bvh.pk_tri_rows, bvh.pk_meta,
                       bvh.pk_bounds, pm, rpl=bvh.rpl,
                       fused=bvh.fused_nodes, stream_tris=stream,
                       packed16=bvh.packed16, **kw)
    r = o.shape[0]
    sw = (tile_shape is not None and tile_shape[0] * tile_shape[1] == r
          and tile_shape[1] % SWIZZLE_TW == 0)
    if sw:
        ht, w = tile_shape
        pad_rows = (-ht) % SWIZZLE_TH
        if pad_rows:  # dead rays: empty interval, traced for free
            o = jnp.pad(o, ((0, pad_rows * w), (0, 0)))
            d = jnp.pad(d, ((0, pad_rows * w), (0, 0)), constant_values=1.0)
            t_min = jnp.pad(t_min, (0, pad_rows * w), constant_values=1.0)
            t_max = jnp.pad(t_max, (0, pad_rows * w), constant_values=0.0)
            ht += pad_rows
        o, d, t_min, t_max = (_swizzle(x, ht, w)
                              for x in (o, d, t_min, t_max))
    t, prim, u, v = kern(o, d, t_min, t_max, any_hit=any_hit)
    if sw:
        t, prim, u, v = (_unswizzle(x, ht, w)[:r]
                         for x in (t, prim, u, v))
    return t, prim, u, v


@partial(jax.jit, static_argnames=("leaf_size", "tile_shape", "sort_rays"))
def intersect_closest(tris: Triangles, bvh: BVH, o, d,
                      t_min=1e-5, t_max=BIG, leaf_size: int = 8,
                      tile_shape=None, sort_rays: bool = False) -> Hit:
    """Closest hit for a batch of rays. o, d: (R, 3); t_min/t_max scalar or (R,).

    Dispatches by (static) scene size: dense VPU brute force for small
    scenes, Pallas packet BVH traversal otherwise.  tile_shape=(H, W): the
    rays form a row-major H x W grid — lets the packet path process square
    screen tiles instead of raster strips.  sort_rays: permute rays by
    (octant, origin cell) before tracing — use for INCOHERENT batches
    (bounce rays); mutually exclusive with tile_shape.
    """
    r = o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    if tris.v0.shape[0] <= BRUTE_FORCE_MAX_TRIS:
        t, prim, u, v = _closest_brute_chunked(tris, o, d, t_min, t_max)
        return Hit(t=t, prim=prim, u=u, v=v)
    if _use_packet(tris, bvh):
        stream = _stream_tris(tris, bvh)
        if sort_rays and tile_shape is None:
            t, prim, u, v = _sorted_packet_trace(bvh, o, d, t_min, t_max,
                                                 False, stream=stream)
        else:
            t, prim, u, v = _packet_trace(bvh, o, d, t_min, t_max, False,
                                          tile_shape, stream=stream)
        return Hit(t=t, prim=prim, u=u, v=v)
    leaf_size = max(leaf_size, 14 * bvh.rpl)
    f = jax.vmap(
        lambda oo, dd, lo, hi: _traverse_one(tris, bvh, oo, dd, lo, hi, False, leaf_size)
    )
    t, prim, u, v = f(o, d, t_min, t_max)
    return Hit(t=t, prim=prim, u=u, v=v)


@partial(jax.jit, static_argnames=("leaf_size", "tile_shape", "sort_rays"))
def intersect_any(tris: Triangles, bvh: BVH, o, d,
                  t_min=1e-5, t_max=BIG, leaf_size: int = 8,
                  tile_shape=None, sort_rays: bool = False):
    """True where any primitive lies in (t_min, t_max) along the ray.

    Lanes with an empty interval (t_max <= t_min, e.g. pre-culled shadow
    segments) are never traced and report True (callers mask them anyway);
    pre-culling this way speeds the packet path up substantially.
    sort_rays: octant/cell-sort incoherent batches (see intersect_closest)."""
    r = o.shape[0]
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    if tris.v0.shape[0] <= BRUTE_FORCE_MAX_TRIS:
        return _any_brute_chunked(tris, o, d, t_min, t_max)
    if _use_packet(tris, bvh):
        stream = _stream_tris(tris, bvh)
        if sort_rays and tile_shape is None:
            _, prim, _, _ = _sorted_packet_trace(bvh, o, d, t_min, t_max,
                                                 True, stream=stream)
        else:
            _, prim, _, _ = _packet_trace(bvh, o, d, t_min, t_max, True,
                                          tile_shape, stream=stream)
        return prim >= 0
    leaf_size = max(leaf_size, 14 * bvh.rpl)
    f = jax.vmap(
        lambda oo, dd, lo, hi: _traverse_one(tris, bvh, oo, dd, lo, hi, True, leaf_size)
    )
    _, prim, _, _ = f(o, d, t_min, t_max)
    return prim >= 0


def occluded_segment(tris: Triangles, bvh: BVH, p_from, p_to,
                     eps: float = 1e-4, leaf_size: int = 8,
                     live=None, tile_shape=None, sort_rays: bool = False):
    """Segment occlusion the reference's way (lighttracing.cu:290-294):
    origin = p_from, unnormalized dir = p_to - p_from, t in (eps, 1-eps).

    live: optional (R,) bool — segments with live=False are not traced
    (their result is unspecified; callers must mask them out)."""
    d = p_to - p_from
    t_max = 1.0 - eps
    if live is not None:
        t_max = jnp.where(live, jnp.float32(1.0 - eps), jnp.float32(0.0))
    return intersect_any(tris, bvh, p_from, d,
                         t_min=eps, t_max=t_max, leaf_size=leaf_size,
                         tile_shape=tile_shape, sort_rays=sort_rays)


@jax.jit
def intersect_closest_brute(tris: Triangles, o, d, t_min=1e-5, t_max=BIG) -> Hit:
    """Dense rays-x-triangles reference oracle for tests (small inputs only)."""
    t, u, v, ok = _ray_tri(
        o[:, None, :], d[:, None, :],
        tris.v0[None, :, :], tris.e1[None, :, :], tris.e2[None, :, :],
    )
    t_min = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (o.shape[0],))[:, None]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (o.shape[0],))[:, None]
    ok = ok & (t > t_min) & (t < t_max)
    t = jnp.where(ok, t, BIG)
    best = jnp.argmin(t, axis=1)
    rows = jnp.arange(o.shape[0])
    hit_any = ok[rows, best]
    return Hit(
        t=jnp.where(hit_any, t[rows, best], t_max[:, 0]),
        prim=jnp.where(hit_any, best, -1),
        u=u[rows, best],
        v=v[rows, best],
    )
