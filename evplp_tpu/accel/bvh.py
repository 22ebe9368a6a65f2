"""BVH construction (host) + flattened device layout.

Replaces OptiX's Trbvh acceleration (reference rtcomphoton.h:705-707) and the
per-primitive bound/intersect programs (triangleintersect.cu).

Build: binned-SAH splits over triangle centroids, host-side.  A C++ builder
(evplp_tpu/native) is used when its shared library is available; this module
provides the numpy fallback and the device-facing arrays.

Device layout: depth-first node order with *skip pointers* so traversal is
stackless — each ray's loop state is (node, t, hit) and the step is
    hit bbox  -> node + 1        (descend)
    miss/leaf -> skip[node]      (advance past subtree)
which maps cleanly onto lax.while_loop lanes and Pallas scalar loops.
Leaf triangles are contiguous: triangles are permuted into leaf order at
build time (use `perm`).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np

LEAF_SIZE = 8
SAH_BINS = 16
# packet tri-row geometry: ROW_TRIS triangles per 128-lane row at
# ROW_STRIDE lanes each (9 floats: v0, e1, e2).  14x9 = 126 lanes used —
# 43% less tri-row VMEM than the original 8 x 16-lane slots
ROW_TRIS = 14
ROW_STRIDE = 9


@dataclass(frozen=True)
class BVH:
    """Flattened BVH. N nodes, DFS order, root = 0.

    node_min/node_max: (N, 3) bounds.
    node_skip: (N,) int32 — next node after this subtree (N = done).
    node_first: (N,) int32 — leaf: first triangle; internal: unused (-1).
    node_count: (N,) int32 — leaf: #triangles; internal: 0.

    pk_*: VMEM-packed mirror for the Pallas packet kernels
    (trace/packet3.py, packet7.py): 8 triangles per 128-lane row, meta
    [count, leaf_row|_, right_child, split_axis], bounds (N, 8) — with
    fused_nodes the meta also rides in bounds lanes 6/7 — and the
    slot->tri map.  Dummy 1-row arrays when the scene is below the
    packet threshold.
    """
    node_min: jnp.ndarray
    node_max: jnp.ndarray
    node_skip: jnp.ndarray
    node_first: jnp.ndarray
    node_count: jnp.ndarray
    pk_tri_rows: jnp.ndarray   # (L, 128) f32
    pk_meta: jnp.ndarray       # (N, 4) i32
    pk_bounds: jnp.ndarray     # (N, 8) f32
    pk_prim_map: jnp.ndarray   # (L*ROW_TRIS,) i32
    # triangle ROWS per leaf (static): leaves hold up to rpl*8 triangles in
    # rpl consecutive 128-lane rows; bigger leaves halve the tree's internal
    # node count (traversal is per-iteration-bound, drains are cheap)
    rpl: int = 1
    # True -> per-triangle scene arrays are stored in SLOT order (leaf-row
    # padded, pk_prim_map-shaped): the packet kernels' slot ids ARE the
    # triangle ids and the per-ray prim_map gather (~7 ms per Mray on v5e)
    # disappears; node_first is slot-based so the vmap fallback agrees
    slot_order: bool = False
    # True -> pk_meta is folded into pk_bounds lanes 6/7 as bitcast words
    # (word0 = count | leaf_row<<6; word1 = right<<2 | axis) and pk_meta is
    # a dummy.  VMEM arrays pad their minor dim to 128 lanes, so the
    # separate (N, 4) meta array cost a full 512 B/node; fusing it into
    # the bounds row's free lanes halves per-node VMEM — with 32-triangle
    # leaves this lifts the packet path's scene ceiling to ~1.6M triangles
    fused_nodes: bool = False
    # True -> pk_bounds is additionally reshaped (ceil(N/16), 128): 16
    # fused node rows share one 128-lane VMEM row (node n at lanes
    # (n%16)*8 .. +8).  Kernels fetch row n>>4 and pltpu.roll the node's
    # lanes to 0-7 — 16x less node VMEM (~32 B/node), which with
    # HBM-streamed tri rows lifts the scene ceiling to ~20M triangles.
    # Requires fused_nodes.
    packed16: bool = False

    @property
    def num_nodes(self) -> int:
        return self.node_min.shape[0]

    @property
    def has_packed(self) -> bool:
        return self.pk_tri_rows.shape[0] > 1

    def tree_flatten(self):  # pragma: no cover
        return (self.node_min, self.node_max, self.node_skip,
                self.node_first, self.node_count,
                self.pk_tri_rows, self.pk_meta, self.pk_bounds,
                self.pk_prim_map), (self.rpl, self.slot_order,
                                    self.fused_nodes, self.packed16)

    @classmethod
    def tree_unflatten(cls, aux, leaves):  # pragma: no cover
        return cls(*leaves, rpl=aux[0], slot_order=aux[1],
                   fused_nodes=aux[2], packed16=aux[3])


jtu.register_pytree_node(BVH, BVH.tree_flatten, BVH.tree_unflatten)


def _build_topology(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
                    leaf_size: int):
    """Binned-SAH recursive build (iterative stack). Returns host arrays
    (node_min, node_max, node_skip, node_first, node_count, perm)."""
    num_tris = v0.shape[0]
    tri_min = np.minimum(np.minimum(v0, v1), v2)
    tri_max = np.maximum(np.maximum(v0, v1), v2)
    centroids = (tri_min + tri_max) * 0.5

    perm = np.arange(num_tris)

    node_min: list = []
    node_max: list = []
    node_first: list = []
    node_count: list = []
    children: list = []  # (left_id, right_id) or None for leaf

    def surface(mn, mx):
        d = np.maximum(mx - mn, 0.0)
        return d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0]

    def new_node(lo, hi):
        ids = perm[lo:hi]
        node_min.append(tri_min[ids].min(axis=0))
        node_max.append(tri_max[ids].max(axis=0))
        node_first.append(lo)
        node_count.append(hi - lo)
        children.append(None)
        return len(node_min) - 1

    root = new_node(0, num_tris)
    stack = [(root, 0, num_tris)]
    while stack:
        node, lo, hi = stack.pop()
        n = hi - lo
        if n <= leaf_size:
            continue
        ids = perm[lo:hi]
        cen = centroids[ids]
        cmin, cmax = cen.min(axis=0), cen.max(axis=0)
        extent = cmax - cmin

        best = None  # (cost, axis, threshold)
        for axis in range(3):
            if extent[axis] <= 1e-12:
                continue
            # binned SAH
            rel = (cen[:, axis] - cmin[axis]) / extent[axis]
            bins = np.minimum((rel * SAH_BINS).astype(np.int32), SAH_BINS - 1)
            counts = np.bincount(bins, minlength=SAH_BINS)
            bmin = np.full((SAH_BINS, 3), np.inf)
            bmax = np.full((SAH_BINS, 3), -np.inf)
            for b in range(SAH_BINS):
                sel = bins == b
                if counts[b]:
                    bmin[b] = tri_min[ids[sel]].min(axis=0)
                    bmax[b] = tri_max[ids[sel]].max(axis=0)
            # prefix/suffix sweeps
            lmin = np.minimum.accumulate(bmin, axis=0)
            lmax = np.maximum.accumulate(bmax, axis=0)
            rmin = np.minimum.accumulate(bmin[::-1], axis=0)[::-1]
            rmax = np.maximum.accumulate(bmax[::-1], axis=0)[::-1]
            lcount = np.cumsum(counts)
            rcount = n - lcount
            cost = np.full(SAH_BINS - 1, np.inf)
            for b in range(SAH_BINS - 1):
                if lcount[b] == 0 or rcount[b] == 0:
                    continue
                cost[b] = (surface(lmin[b], lmax[b]) * lcount[b]
                           + surface(rmin[b + 1], rmax[b + 1]) * rcount[b])
            b = int(np.argmin(cost))
            if np.isfinite(cost[b]) and (best is None or cost[b] < best[0]):
                thr = cmin[axis] + extent[axis] * (b + 1) / SAH_BINS
                best = (cost[b], axis, thr)

        if best is None:
            # all centroids coincide: arbitrary index split (fat leaves are
            # not allowed — the packet layout requires count <= leaf_size)
            mid = lo + n // 2
        else:
            _, axis, thr = best
            mask = centroids[perm[lo:hi], axis] < thr
            mid = lo + int(mask.sum())
            if mid == lo or mid == hi:  # degenerate: median split
                order = np.argsort(centroids[perm[lo:hi], axis], kind="stable")
                perm[lo:hi] = perm[lo:hi][order]
                mid = lo + n // 2
            else:
                seg = perm[lo:hi]
                perm[lo:hi] = np.concatenate([seg[mask], seg[~mask]])

        left = new_node(lo, mid)
        right = new_node(mid, hi)
        children[node] = (left, right)
        node_first[node] = -1
        node_count[node] = 0
        stack.append((right, mid, hi))
        stack.append((left, lo, mid))

    return (np.asarray(node_min, np.float32), np.asarray(node_max, np.float32),
            children, np.asarray(node_first, np.int32),
            np.asarray(node_count, np.int32), perm)


def _flatten_dfs(node_min, node_max, children, node_first, node_count):
    """Reorder nodes into DFS order and compute skip pointers."""
    n = len(node_min)
    order = np.zeros(n, np.int32)
    skip = np.zeros(n, np.int32)
    new_index = np.zeros(n, np.int32)

    pos = 0
    stack = [0]
    while stack:  # DFS preorder
        node = stack.pop()
        order[pos] = node
        new_index[node] = pos
        pos += 1
        ch = children[node]
        if ch is not None:
            stack.append(ch[1])
            stack.append(ch[0])

    # skip pointer = DFS position after my subtree
    subtree = np.zeros(n, np.int32)  # subtree sizes in DFS terms

    def subtree_size(node):
        # iterative postorder
        sizes = {}
        st = [(node, False)]
        while st:
            nd, done = st.pop()
            ch = children[nd]
            if ch is None:
                sizes[nd] = 1
            elif done:
                sizes[nd] = 1 + sizes[ch[0]] + sizes[ch[1]]
            else:
                st.append((nd, True))
                st.append((ch[0], False))
                st.append((ch[1], False))
        return sizes

    sizes = subtree_size(0)
    for old in range(n):
        subtree[new_index[old]] = sizes[old]
    for i in range(n):
        skip[i] = i + subtree[i]

    return (node_min[order], node_max[order], skip,
            node_first[order], node_count[order])


def _try_native_build(v0, v1, v2, leaf_size):
    """Use the C++ builder when compiled (evplp_tpu/native)."""
    try:
        from evplp_tpu.native import bvh_native
        return bvh_native.build(v0, v1, v2, leaf_size)
    except Exception:
        return None


def _pack_for_packet(nmin, nmax, skip, first, count, v0p, v1p, v2p,
                     leaf_size: int = 8):
    """Vectorized host packing for the Pallas packet kernels:
    8 triangles per 128-lane row, ceil(leaf_size/8) consecutive rows per
    leaf, leaf-major; returns the pk_* arrays."""
    n = count.shape[0]
    num_tris = v0p.shape[0]
    rpl = -(-leaf_size // ROW_TRIS)
    assert count.max(initial=0) <= rpl * ROW_TRIS, \
        f"packet layout requires leaf_size <= {rpl * ROW_TRIS}"
    leaf_nodes = np.nonzero(count > 0)[0]
    l = max(len(leaf_nodes), 1) * rpl

    leaf_row_of_node = np.zeros(n, np.int32)
    leaf_row_of_node[leaf_nodes] = rpl * np.arange(len(leaf_nodes),
                                                   dtype=np.int32)

    starts = first[leaf_nodes].astype(np.int64)          # (L,)
    counts = np.minimum(count[leaf_nodes], rpl * ROW_TRIS).astype(np.int64)
    k = np.arange(rpl * ROW_TRIS, dtype=np.int64)[None, :]
    tri_idx = starts[:, None] + k                        # (L, rpl*8)
    valid = (k < counts[:, None]) & (tri_idx < num_tris)
    tri_c = np.minimum(tri_idx, num_tris - 1)

    e1p = v1p - v0p
    e2p = v2p - v0p
    rows = np.zeros((l, ROW_TRIS, ROW_STRIDE), np.float32)
    nl = len(leaf_nodes) * rpl
    rows[:nl, :, 0:3] = np.where(valid[..., None], v0p[tri_c], 0) \
        .reshape(-1, ROW_TRIS, 3)
    rows[:nl, :, 3:6] = np.where(valid[..., None], e1p[tri_c], 0) \
        .reshape(-1, ROW_TRIS, 3)
    rows[:nl, :, 6:9] = np.where(valid[..., None], e2p[tri_c], 0) \
        .reshape(-1, ROW_TRIS, 3)
    rows = np.pad(rows.reshape(l, ROW_TRIS * ROW_STRIDE),
                  ((0, 0), (0, 128 - ROW_TRIS * ROW_STRIDE)))
    prim_map = np.full((l * ROW_TRIS,), -1, np.int32)
    prim_map[:nl * ROW_TRIS] = np.where(valid, tri_c, -1).astype(np.int32) \
        .reshape(-1)

    meta = np.zeros((n, 4), np.int32)
    meta[:, 0] = np.minimum(count, rpl * ROW_TRIS)
    meta[:, 1] = np.where(count > 0, leaf_row_of_node, 0)
    internal = np.nonzero(count == 0)[0]
    right = np.zeros(n, np.int32)
    right[internal] = skip[np.minimum(internal + 1, n - 1)]
    meta[:, 2] = right

    # split axis for ordered (near-child-first) traversal: the axis along
    # which the two children's bound centers are farthest apart; the LEFT
    # child is the lower side (builders split below-threshold -> left)
    ctr = (nmin + nmax) * 0.5
    left_id = np.minimum(internal + 1, n - 1)
    right_id = np.minimum(right[internal], n - 1)
    gap = ctr[right_id] - ctr[left_id]
    meta[internal, 3] = np.argmax(gap, axis=1).astype(np.int32) \
        if len(internal) else 0

    bounds = np.zeros((n, 8), np.float32)
    bounds[:, 0:3] = nmin
    bounds[:, 3:6] = nmax
    # fused meta words in the bounds row's free lanes (BVH.fused_nodes):
    # word0 = count | leaf_row << 6 ; word1 = right << 2 | split_axis
    w0 = (meta[:, 0] | (meta[:, 1] << 6)).astype(np.int32)
    w1 = ((meta[:, 2] << 2) | meta[:, 3]).astype(np.int32)
    bounds[:, 6] = w0.view(np.float32)
    bounds[:, 7] = w1.view(np.float32)

    return rows, meta, bounds, prim_map


def build_bvh(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
              leaf_size: int = LEAF_SIZE, pack: bool | None = None,
              slot_order: bool = False, fused_nodes: bool = False,
              packed_nodes: bool | None = None):
    """Build and flatten. Returns (BVH, order) — per-triangle arrays must
    be built as X[order[i]] (order[i] == -1: padding row, use a degenerate
    default).  Without slot_order, `order` is the classic leaf permutation.

    pack: include the packet-kernel layout (default: only for scenes above
    the brute-force threshold, where the packet path is used).
    slot_order: when packed, emit triangle ids in SLOT space (leaf-row
    padded): kernels skip the slot->prim gather, node_first becomes the
    slot of the leaf's first triangle."""
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)

    native = _try_native_build(v0, v1, v2, leaf_size)
    if native is not None:
        nmin, nmax, skip, first, count, perm = native
    else:
        nmin, nmax, children, first, count, perm = _build_topology(v0, v1, v2, leaf_size)
        nmin, nmax, skip, first, count = _flatten_dfs(nmin, nmax, children, first, count)

    if pack is None:
        from evplp_tpu.trace.intersect import BRUTE_FORCE_MAX_TRIS
        pack = v0.shape[0] > BRUTE_FORCE_MAX_TRIS
    if pack:
        pk = _pack_for_packet(nmin, nmax, skip, first, count,
                              v0[perm], v1[perm], v2[perm],
                              leaf_size=leaf_size)
        if slot_order:
            prim_map = pk[3]
            order = np.where(prim_map >= 0,
                             perm[np.maximum(prim_map, 0)], -1)
            meta = pk[1]
            # node_first in slot space: leaf_row * ROW_TRIS
            first = np.where(count > 0, meta[:, 1] * ROW_TRIS,
                             -1).astype(np.int32)
    else:
        pk = (np.zeros((1, 128), np.float32), np.zeros((1, 4), np.int32),
              np.zeros((1, 8), np.float32), np.full((8,), -1, np.int32))

    pk_bounds = pk[2]
    if packed_nodes is None:
        # Auto: the trace dispatch (intersect._use_packet) compares the
        # PADDED slot count against its caps, so the layout decision must
        # use the same number — deciding on the raw triangle count left a
        # band (raw < STREAM_CAP < padded) where neither the streamed nor
        # the packed16 packet path applied and 100M-ray workloads fell to
        # the vmapped traversal (whose materialized broadcasts OOM HBM).
        from evplp_tpu.trace.intersect import STREAM_CAP
        packed_nodes = bool(pack and fused_nodes
                            and pk[3].shape[0] > STREAM_CAP)
    if pack and packed_nodes:
        assert fused_nodes, "packed_nodes requires fused_nodes"
        n = pk_bounds.shape[0]
        padn = (-n) % 16
        pb = np.pad(pk_bounds, ((0, padn), (0, 0)))
        pk_bounds = pb.reshape(-1, 128)
    bvh = BVH(
        node_min=jnp.asarray(nmin),
        node_max=jnp.asarray(nmax),
        node_skip=jnp.asarray(skip, dtype=jnp.int32),
        node_first=jnp.asarray(first, dtype=jnp.int32),
        node_count=jnp.asarray(count, dtype=jnp.int32),
        pk_tri_rows=jnp.asarray(pk[0]),
        pk_meta=jnp.asarray(pk[1]),
        pk_bounds=jnp.asarray(pk_bounds),
        pk_prim_map=jnp.asarray(pk[3]),
        rpl=-(-leaf_size // ROW_TRIS) if pack else 1,
        slot_order=bool(pack and slot_order),
        fused_nodes=bool(pack and fused_nodes),
        packed16=bool(pack and packed_nodes),
    )
    if pack and slot_order:
        return bvh, order
    return bvh, perm
