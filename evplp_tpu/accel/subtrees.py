"""Two-level BVH layout for the per-lane (SIMT-on-VPU) traversal path.

The packet kernels (trace/packet3.py) steer every packet through one
scalar pointer chase; incoherent bounce rays make the packet's working
set approach the whole tree (~2914 iters per 8192-ray packet at 102k
tris).  The per-lane path gives EVERY RAY its own traversal using
Mosaic's `tpu.dynamic_gather` (same-shape 2D `take_along_axis`): with a
table replicated across sublanes, ONE lane-gather fetches an arbitrary
128-entry table element per lane; two gathers + a select cover 256.
(NOTES.md round-3 study: vreg chains ~2.5 ns/op, gathers ~+1.7 ns,
mock unified traversal step ~131 ns per 1024 rays.)

That bounds any per-lane table to ~256 entries, so the tree is CUT:

  * SUBTREES of <= 255 triangles / <= 255 nodes each, walked per-lane
    by subtree-pure 1024-ray rows after an XLA regroup, and
  * a TOP phase that is just the LIST of subtree root boxes: each ray
    scans all S boxes (scalar-broadcast slab tests — no gathers) and
    takes its nearest not-yet-processed subtree, giving front-to-back
    subtree ordering with early termination across rounds.

Subtrees use the threaded (DFS + skip link) form the flat BVH already
carries (accel/bvh.py _flatten_dfs): on box hit an internal node falls
through to i+1, otherwise (and after a leaf) control moves to skip[i];
id DONE (=255) means finished.  No per-lane stack.

Node encoding — 8 fields, field f of local node i at
sub_nodes[k, 2*f + (i>>7), i & 127]:

  f0..f2  bbox min xyz
  f3..f5  bbox max xyz
  f6      0 for internal; LEAF_TAG + first_local_tri*64 + count for a leaf
  f7      skip link (local id; DONE = 255 means finished)

Padding entries: f6 = 0, f7 = DONE, bbox = [+BIG, -BIG] (never hits).
All ids/payloads are small non-negative ints stored exactly in f32.
Triangle pages hold 10 fields (v0 xyz, e1 xyz, e2 xyz, global prim id)
in the same 2-page layout: sub_tris[k, 2*f + (j>>7), j & 127].

Reference parity: replaces OptiX Trbvh traversal scheduling
(rtcomphoton.h:705-707) for incoherent workloads; the intersection
math stays Moller-Trumbore (triangleintersect.cu).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np

LEAF_TAG = 1 << 20            # exact in f32; > any payload
CAP = 255                     # max tris / nodes per subtree (2 pages)
DONE = 255                    # skip-link sentinel: lane finished
MAX_LEAF_TRIS = 63            # payload packs count in 6 bits
BIG = 3.0e38


@dataclass(frozen=True)
class PerLaneBVH:
    """Per-lane two-level layout (static shapes; device arrays).

    sub_boxes: (S, 8) f32 — root bbox per subtree (min3, max3, pad2).
    sub_nodes: (S, 16, 128) f32 — 8 fields x 2 lane-pages.
    sub_tris:  (S, 20, 128) f32 — 10 fields x 2 lane-pages.
    """
    sub_boxes: jnp.ndarray
    sub_nodes: jnp.ndarray
    sub_tris: jnp.ndarray
    n_sub: int

    def tree_flatten(self):  # pragma: no cover
        return (self.sub_boxes, self.sub_nodes, self.sub_tris), \
            (self.n_sub,)

    @classmethod
    def tree_unflatten(cls, aux, leaves):  # pragma: no cover
        return cls(*leaves, n_sub=aux[0])


jtu.register_pytree_node(PerLaneBVH, PerLaneBVH.tree_flatten,
                         PerLaneBVH.tree_unflatten)


def _tri_extents(node_skip, node_first, node_count):
    """Per-node triangle storage extent [lo, hi) over the subtree rooted
    there.  Works for both leaf-ordered and slot-ordered scenes: leaves
    appear in DFS order and their storage ranges are ascending, so a
    subtree's triangles are one contiguous extent (slot padding between
    leaf rows is carried along but never referenced by any payload)."""
    n = len(node_skip)
    lo = np.full(n + 1, np.iinfo(np.int64).max, np.int64)
    hi = np.zeros(n + 1, np.int64)
    is_leaf = node_count > 0
    lo[:-1][is_leaf] = node_first[is_leaf]
    hi[:-1][is_leaf] = node_first[is_leaf] + node_count[is_leaf]
    # suffix-scan in reverse DFS order: extent(i) spans nodes i..skip[i]
    lo_s = np.minimum.accumulate(lo[::-1])[::-1]
    hi_s = np.maximum.accumulate(hi[::-1])[::-1]

    def ext(i):
        e = node_skip[i]
        l = lo_s[i] if lo_s[i] != np.iinfo(np.int64).max else 0
        h = hi_s[i]
        # clip to the subtree: suffix scan overshoots past skip[i]
        l2 = lo[i:e][lo[i:e] != np.iinfo(np.int64).max]
        h2 = hi[i:e][hi[i:e] != 0]
        if len(l2) == 0:
            return 0, 0
        return int(l2.min()), int(h2.max())

    return ext


def cut_subtrees(node_skip: np.ndarray, node_count: np.ndarray,
                 cap_tris: int = CAP, cap_nodes: int = CAP,
                 node_first: np.ndarray | None = None):
    """Partition the DFS tree into subtree roots with bounded size.

    Returns (roots, tri_lo, tri_hi) — roots in DFS order with each
    subtree's triangle storage extent (contiguous: leaves appear in
    DFS order in both leaf- and slot-ordered scenes)."""
    if node_first is None:
        leafc = np.where(node_count > 0, node_count, 0).astype(np.int64)
        node_first = np.concatenate([[0], np.cumsum(leafc)])[:-1]
        node_first = np.where(node_count > 0, node_first, 0)
    ext = _tri_extents(node_skip, node_first, node_count)

    roots = []
    stack = [0]
    while stack:
        i = stack.pop()
        lo, hi = ext(i)
        nodes_in = node_skip[i] - i
        if (hi - lo <= cap_tris and nodes_in <= cap_nodes) \
                or node_count[i] > 0:
            roots.append(i)
        else:
            left = i + 1
            right = node_skip[left]
            stack.append(right)
            stack.append(left)
    roots = np.asarray(sorted(roots), np.int32)
    los = np.asarray([ext(r)[0] for r in roots], np.int64)
    his = np.asarray([ext(r)[1] for r in roots], np.int64)
    return roots, los, his


def _two_pages(fields: np.ndarray, pad_value=0.0) -> np.ndarray:
    """(F, n<=256) table -> (2F, 128): field f pages at rows 2f, 2f+1."""
    f, n = fields.shape
    out = np.full((f, 256), pad_value, np.float32)
    out[:, :n] = fields
    return out.reshape(f, 2, 128).reshape(2 * f, 128)


def build_perlane(node_min, node_max, node_skip, node_first, node_count,
                  v0, e1, e2, prim_ids=None,
                  cap_tris: int = CAP) -> PerLaneBVH:
    """Pack a flat DFS BVH + leaf-ordered triangles into PerLaneBVH.

    Inputs are host numpy arrays (device arrays are converted).  v0/e1/e2
    are LEAF-ORDERED (build permutation applied, matching Triangles).
    prim_ids: global prim id per leaf-ordered slot (default arange).
    Requires every leaf count <= 63."""
    node_min = np.asarray(node_min)
    node_max = np.asarray(node_max)
    node_skip = np.asarray(node_skip)
    node_count = np.asarray(node_count)
    v0 = np.asarray(v0)
    e1 = np.asarray(e1)
    e2 = np.asarray(e2)
    t = v0.shape[0]
    if prim_ids is None:
        prim_ids = np.arange(t, dtype=np.int64)
    prim_ids = np.asarray(prim_ids)

    assert node_count.max(initial=0) <= MAX_LEAF_TRIS, \
        f"leaf count {node_count.max()} > {MAX_LEAF_TRIS}"
    node_first = np.asarray(node_first)

    roots, tri_lo, tri_hi = cut_subtrees(node_skip, node_count,
                                         min(cap_tris, CAP), CAP,
                                         node_first=node_first)
    s = len(roots)

    sub_boxes = np.zeros((s, 8), np.float32)
    sub_nodes = np.zeros((s, 16, 128), np.float32)
    sub_tris = np.zeros((s, 20, 128), np.float32)
    for k, r in enumerate(roots):
        end = node_skip[r]
        ids = np.arange(r, end)
        nl = len(ids)
        assert nl <= CAP, nl
        sub_boxes[k, 0:3] = node_min[r]
        sub_boxes[k, 3:6] = node_max[r]

        fields = np.zeros((8, 256), np.float32)
        # padding boxes never hit; padding skip pins the lane at DONE
        fields[0:3] = BIG
        fields[3:6] = -BIG
        fields[7] = DONE
        fields[0:3, :nl] = node_min[ids].T
        fields[3:6, :nl] = node_max[ids].T
        is_leaf = node_count[ids] > 0
        local_first = np.where(is_leaf, node_first[ids] - tri_lo[k], 0)
        payload = LEAF_TAG + local_first * 64 + node_count[ids]
        fields[6, :nl] = np.where(is_leaf, payload, 0).astype(np.float32)
        skip_l = np.minimum(node_skip[ids], end) - r
        fields[7, :nl] = np.where(skip_l >= nl, DONE, skip_l)
        sub_nodes[k] = _two_pages(fields[:, :256])

        lo = tri_lo[k]
        hi = tri_hi[k]
        nt = int(hi - lo)
        assert nt <= CAP, nt
        tf = np.zeros((10, nt), np.float32)
        tf[0:3] = v0[lo:hi].T
        tf[3:6] = e1[lo:hi].T
        tf[6:9] = e2[lo:hi].T
        tf[9] = prim_ids[lo:hi]
        sub_tris[k] = _two_pages(tf)

    return PerLaneBVH(sub_boxes=jnp.asarray(sub_boxes),
                      sub_nodes=jnp.asarray(sub_nodes),
                      sub_tris=jnp.asarray(sub_tris), n_sub=s)


def reference_walk(pl_bvh: PerLaneBVH, o, d, t_min, t_max):
    """Host-side reference traversal (numpy, one ray): scan subtree
    boxes nearest-first with early-out, walk each entered subtree via
    the packed pages — validates the encoding independently of any
    kernel.  Returns (t, prim)."""
    boxes = np.asarray(pl_bvh.sub_boxes)
    nodes = np.asarray(pl_bvh.sub_nodes).reshape(-1, 8, 256)
    tris = np.asarray(pl_bvh.sub_tris).reshape(-1, 10, 256)
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)
    inv = 1.0 / np.where(np.abs(d) < 1e-20,
                         np.where(d >= 0, 1e-20, -1e-20), d)

    best_t, best_p = float(t_max), -1

    def slab(lo, hi, bound):
        t0 = (lo - o) * inv
        t1 = (hi - o) * inv
        tn = np.minimum(t0, t1).max()
        tf = np.maximum(t0, t1).min()
        return (tn <= tf and tf >= 0.0 and tn <= bound), tn

    def walk_subtree(k):
        nonlocal best_t, best_p
        i = 0
        while i != DONE:
            f6 = int(nodes[k, 6, i])
            skip = int(nodes[k, 7, i])
            hit, _ = slab(nodes[k, 0:3, i], nodes[k, 3:6, i], best_t)
            if hit:
                if f6 >= LEAF_TAG:
                    payload = f6 - LEAF_TAG
                    first, cnt = payload // 64, payload % 64
                    for j in range(first, first + cnt):
                        tv0 = tris[k, 0:3, j]
                        te1 = tris[k, 3:6, j]
                        te2 = tris[k, 6:9, j]
                        p = np.cross(d, te2)
                        det = te1 @ p
                        if abs(det) < 1e-12:
                            continue
                        sv = o - tv0
                        u = (sv @ p) / det
                        q = np.cross(sv, te1)
                        v = (d @ q) / det
                        tt = (te2 @ q) / det
                        if u >= 0 and v >= 0 and u + v <= 1 \
                                and t_min < tt < best_t:
                            best_t, best_p = tt, int(tris[k, 9, j])
                    i = skip
                else:
                    i += 1
            else:
                i = skip

    # nearest-first rounds over subtree root boxes with early-out
    last = (-np.inf, -1)
    while True:
        nxt = (np.inf, -1)
        for k in range(pl_bvh.n_sub):
            hit, tn = slab(boxes[k, 0:3], boxes[k, 3:6], best_t)
            if hit and (tn, k) > last and (tn, k) < nxt:
                nxt = (tn, k)
        if nxt[1] < 0 or nxt[0] > best_t:
            break
        walk_subtree(nxt[1])
        last = nxt
    return best_t, best_p
