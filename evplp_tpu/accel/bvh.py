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


@dataclass(frozen=True)
class BVH:
    """Flattened BVH. N nodes, DFS order, root = 0.

    node_min/node_max: (N, 3) bounds.
    node_skip: (N,) int32 — next node after this subtree (N = done).
    node_first: (N,) int32 — leaf: first triangle; internal: unused (-1).
    node_count: (N,) int32 — leaf: #triangles; internal: 0.
    """
    node_min: jnp.ndarray
    node_max: jnp.ndarray
    node_skip: jnp.ndarray
    node_first: jnp.ndarray
    node_count: jnp.ndarray

    @property
    def num_nodes(self) -> int:
        return self.node_min.shape[0]

    def tree_flatten(self):  # pragma: no cover
        return (self.node_min, self.node_max, self.node_skip,
                self.node_first, self.node_count), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):  # pragma: no cover
        return cls(*leaves)


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
            continue  # all centroids coincide: keep as (fat) leaf
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


def build_bvh(v0: np.ndarray, v1: np.ndarray, v2: np.ndarray,
              leaf_size: int = LEAF_SIZE):
    """Build and flatten. Returns (BVH, perm) — apply perm to all
    per-triangle arrays before upload."""
    v0 = np.asarray(v0, np.float32)
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)

    native = _try_native_build(v0, v1, v2, leaf_size)
    if native is not None:
        nmin, nmax, skip, first, count, perm = native
    else:
        nmin, nmax, children, first, count, perm = _build_topology(v0, v1, v2, leaf_size)
        nmin, nmax, skip, first, count = _flatten_dfs(nmin, nmax, children, first, count)

    bvh = BVH(
        node_min=jnp.asarray(nmin),
        node_max=jnp.asarray(nmax),
        node_skip=jnp.asarray(skip, dtype=jnp.int32),
        node_first=jnp.asarray(first, dtype=jnp.int32),
        node_count=jnp.asarray(count, dtype=jnp.int32),
    )
    return bvh, perm
