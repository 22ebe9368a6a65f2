"""Two-level BVH layout for the per-lane (SIMT-on-VPU) traversal path.

The packet kernels (trace/packet3.py) steer every packet through one
scalar pointer chase; incoherent bounce rays make the packet's working
set approach the whole tree (~2914 iters per 8192-ray packet at 102k
tris).  The per-lane path instead gives EVERY RAY its own traversal,
using Mosaic's `tpu.dynamic_gather` (same-shape 2D take_along_axis):
composing a lane-gather with a sublane-gather fetches an arbitrary
entry of a 1024-element table per lane in 2 vector ops (NOTES.md
round-3 study: ~2.5 ns/vreg-op chains, gathers ~+1.7 ns).

That primitive bounds any in-register table to 1024 entries, so the
tree is CUT in two:

  * a TOP tree (<= 1023 nodes) whose leaves are subtree handles, walked
    per-lane to give each ray its nearest-first subtree list, and
  * SUBTREES of <= 1024 triangles / <= 1024 nodes each, walked per-lane
    by subtree-pure ray packets after an XLA regroup.

Both levels use the same threaded (DFS + skip link) form the flat BVH
already carries (accel/bvh.py _flatten_dfs): on box hit an internal
node falls through to i+1, otherwise (and after a leaf) control moves
to skip[i]; id >= n means done.  No per-lane stack is needed.

Page encoding (per level): 8 fields per node, field f of node i at
pages[f, i >> 7, i & 127]:

  f0..f2  bbox min xyz
  f3..f5  bbox max xyz
  f6      0 for internal; LEAF_TAG + payload for a leaf
          (bottom: payload = first_local_tri * 64 + tri_count;
           top:    payload = subtree index)
  f7      skip link (local id; >= n_local means done)

All values are small non-negative ints stored exactly in f32.
Triangle pages hold 10 fields: v0 xyz, e1 xyz, e2 xyz, global prim id.

Reference parity: this replaces OptiX Trbvh traversal scheduling
(rtcomphoton.h:705-707) for incoherent workloads; the intersection
math itself stays Moller-Trumbore (triangleintersect.cu).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np

LEAF_TAG = 1 << 20            # exact in f32; > any skip link / payload
PAGE = 1024                   # entries per composed-gather table
MAX_LEAF_TRIS = 63            # payload packs count in 6 bits


@dataclass(frozen=True)
class TwoLevel:
    """Two-level page-packed BVH (static shapes; device arrays)."""
    top_pages: jnp.ndarray     # (8, 8, 128) f32
    node_pages: jnp.ndarray    # (S, 8, 8, 128) f32
    tri_pages: jnp.ndarray     # (S, 10, 8, 128) f32
    n_top: int                 # top nodes used
    n_sub: int                 # number of subtrees S

    def tree_flatten(self):  # pragma: no cover
        return (self.top_pages, self.node_pages, self.tri_pages), \
            (self.n_top, self.n_sub)

    @classmethod
    def tree_unflatten(cls, aux, leaves):  # pragma: no cover
        return cls(*leaves, n_top=aux[0], n_sub=aux[1])


jtu.register_pytree_node(TwoLevel, TwoLevel.tree_flatten,
                         TwoLevel.tree_unflatten)


def _pages_of(fields: np.ndarray) -> np.ndarray:
    """(F, n<=1024) field table -> (F, 8, 128) composed-gather pages."""
    f, n = fields.shape
    out = np.zeros((f, PAGE), np.float32)
    out[:, :n] = fields
    return out.reshape(f, 8, 128)


def cut_subtrees(node_skip: np.ndarray, node_count: np.ndarray,
                 cap_tris: int = PAGE, cap_nodes: int = PAGE):
    """Partition the DFS tree into subtree roots with bounded size.

    Returns (roots, tri_base) — roots in DFS order; tri_base[i] = index
    of the first triangle of subtree i in the leaf-ordered tri arrays
    (subtree triangles are contiguous because leaves appear in DFS
    order and tris are leaf-ordered)."""
    n = len(node_skip)
    leafc = np.where(node_count > 0, node_count, 0).astype(np.int64)
    pref = np.concatenate([[0], np.cumsum(leafc)])

    roots = []
    stack = [0]
    while stack:
        i = stack.pop()
        tris_in = pref[node_skip[i]] - pref[i]
        nodes_in = node_skip[i] - i
        if (tris_in <= cap_tris and nodes_in <= cap_nodes) \
                or node_count[i] > 0:
            roots.append(i)
        else:
            left = i + 1
            right = node_skip[left]
            stack.append(right)
            stack.append(left)
    roots = np.asarray(sorted(roots), np.int32)
    return roots, pref[roots].astype(np.int64)


def build_two_level(node_min, node_max, node_skip, node_first, node_count,
                    v0, e1, e2, prim_ids=None,
                    cap_tris: int = PAGE) -> TwoLevel:
    """Pack a flat DFS BVH + leaf-ordered triangles into TwoLevel pages.

    Inputs are host numpy arrays (device arrays are converted).  v0/e1/e2
    are LEAF-ORDERED (the build permutation already applied, matching
    Triangles).  prim_ids: global prim id per leaf-ordered slot (default
    arange).  Requires every leaf count <= 63 and the top tree to fit
    1023 nodes."""
    node_min = np.asarray(node_min)
    node_max = np.asarray(node_max)
    node_skip = np.asarray(node_skip)
    node_first = np.asarray(node_first)
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

    roots, tri_base = cut_subtrees(node_skip, node_count, cap_tris)
    s = len(roots)
    root_set = {int(r) for r in roots}
    root_index = {int(r): k for k, r in enumerate(roots)}

    # ---- bottom subtrees ----
    node_pages = np.zeros((s, 8, 8, 128), np.float32)
    tri_pages = np.zeros((s, 10, 8, 128), np.float32)
    # leaf-tri prefix over ALL nodes for local tri indexing
    leafc = np.where(node_count > 0, node_count, 0).astype(np.int64)
    pref = np.concatenate([[0], np.cumsum(leafc)])
    for k, r in enumerate(roots):
        end = node_skip[r]
        ids = np.arange(r, end)
        nl = len(ids)
        assert nl <= PAGE, nl
        fields = np.zeros((8, nl), np.float32)
        fields[0:3] = node_min[ids].T
        fields[3:6] = node_max[ids].T
        is_leaf = node_count[ids] > 0
        local_first = (pref[ids] - tri_base[k]).astype(np.int64)
        payload = LEAF_TAG + local_first * 64 + node_count[ids]
        fields[6] = np.where(is_leaf, payload, 0).astype(np.float32)
        fields[7] = (np.minimum(node_skip[ids], end) - r).astype(np.float32)
        node_pages[k] = _pages_of(fields).reshape(8, 8, 128)

        lo = tri_base[k]
        hi = lo + (pref[end] - pref[r])
        nt = int(hi - lo)
        assert nt <= PAGE, nt
        tf = np.zeros((10, nt), np.float32)
        tf[0:3] = v0[lo:hi].T
        tf[3:6] = e1[lo:hi].T
        tf[6:9] = e2[lo:hi].T
        tf[9] = prim_ids[lo:hi]
        tri_pages[k] = _pages_of(tf).reshape(10, 8, 128)

    # ---- top tree: nodes not strictly inside any subtree ----
    inside = np.zeros(len(node_skip), bool)
    for r in roots:
        inside[r + 1:node_skip[r]] = True
    top_ids = np.where(~inside)[0]
    nt_top = len(top_ids)
    assert nt_top <= PAGE - 1, f"top tree {nt_top} nodes > {PAGE - 1}"
    new_id = {int(old): i for i, old in enumerate(top_ids)}

    def remap(old):
        """skip target -> local top id (end-of-tree -> nt_top)."""
        old = int(old)
        while old < len(node_skip) and old not in new_id:
            old += 1  # pragma: no cover - skip targets are top nodes
        return new_id.get(old, nt_top)

    fields = np.zeros((8, nt_top), np.float32)
    fields[0:3] = node_min[top_ids].T
    fields[3:6] = node_max[top_ids].T
    for i, old in enumerate(top_ids):
        if int(old) in root_set:
            fields[6, i] = LEAF_TAG + root_index[int(old)]
        fields[7, i] = remap(node_skip[old])
    top_pages = _pages_of(fields).reshape(8, 8, 128)

    return TwoLevel(
        top_pages=jnp.asarray(top_pages),
        node_pages=jnp.asarray(node_pages),
        tri_pages=jnp.asarray(tri_pages),
        n_top=nt_top, n_sub=s)


def reference_walk(tl: TwoLevel, o, d, t_min, t_max):
    """Host-side reference traversal of the TwoLevel pages (numpy, one
    ray) — validates the page encoding independently of any kernel.
    Returns (t, prim)."""
    top = np.asarray(tl.top_pages).reshape(8, PAGE)
    nodes = np.asarray(tl.node_pages).reshape(tl.n_sub, 8, PAGE)
    tris = np.asarray(tl.tri_pages).reshape(tl.n_sub, 10, PAGE)
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)
    inv = 1.0 / np.where(np.abs(d) < 1e-20, np.where(d >= 0, 1e-20, -1e-20), d)

    best_t, best_p = float(t_max), -1

    def box(fields, i, bound):
        lo = np.array([fields[a, i] for a in range(3)])
        hi = np.array([fields[a + 3, i] for a in range(3)])
        t0 = (lo - o) * inv
        t1 = (hi - o) * inv
        tn = np.minimum(t0, t1).max()
        tf = np.maximum(t0, t1).min()
        return tn <= tf and tf >= 0.0 and tn <= bound

    def walk_subtree(k):
        nonlocal best_t, best_p
        i = 0
        while i < PAGE:
            f6 = int(nodes[k, 6, i])
            skip = int(nodes[k, 7, i])
            if skip <= i:          # past the packed region
                break
            if box(nodes[k], i, best_t):
                if f6 >= LEAF_TAG:
                    payload = f6 - LEAF_TAG
                    first, cnt = payload // 64, payload % 64
                    for j in range(first, first + cnt):
                        tv0 = np.array([tris[k, a, j] for a in range(3)])
                        te1 = np.array([tris[k, a + 3, j] for a in range(3)])
                        te2 = np.array([tris[k, a + 6, j] for a in range(3)])
                        p = np.cross(d, te2)
                        det = te1 @ p
                        if abs(det) < 1e-12:
                            continue
                        s = o - tv0
                        u = (s @ p) / det
                        q = np.cross(s, te1)
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

    i = 0
    while i < tl.n_top:
        f6 = int(top[6, i])
        skip = int(top[7, i])
        if box(top, i, best_t):
            if f6 >= LEAF_TAG:
                walk_subtree(int(f6 - LEAF_TAG))
                i = skip
            else:
                i += 1
        else:
            i = skip
    return best_t, best_p
