"""Per-lane two-level layout checks (accel/subtrees.py).

The host-side reference walk over the packed pages (nearest-first
subtree rounds + threaded subtree walks) must agree with the dense
oracle — validates the cut, local re-indexing, leaf payload packing,
threaded links, and the round-ordering early-out, independently of any
kernel."""
import numpy as np
import pytest

from evplp_tpu.accel.bvh import build_bvh
from evplp_tpu.accel import subtrees


def _soup(n, seed=0, spread=4.0):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    v1 = v0 + rng.normal(0, 0.4, (n, 3)).astype(np.float32)
    v2 = v0 + rng.normal(0, 0.4, (n, 3)).astype(np.float32)
    return v0, v1, v2


def _brute(v0, e1, e2, o, d, t_min, t_max):
    best_t, best_p = t_max, -1
    for j in range(len(v0)):
        p = np.cross(d, e2[j])
        det = e1[j] @ p
        if abs(det) < 1e-12:
            continue
        s = o - v0[j]
        u = (s @ p) / det
        q = np.cross(s, e1[j])
        v = (d @ q) / det
        t = (e2[j] @ q) / det
        if u >= 0 and v >= 0 and u + v <= 1 and t_min < t < best_t:
            best_t, best_p = t, j
    return best_t, best_p


@pytest.mark.parametrize("n,cap", [(300, 64), (300, 255), (1500, 255)])
def test_reference_walk_matches_brute(n, cap):
    v0, v1, v2 = _soup(n)
    bvh, perm = build_bvh(v0, v1, v2, leaf_size=4, pack=False)
    nmin = np.asarray(bvh.node_min)
    nmax = np.asarray(bvh.node_max)
    skip = np.asarray(bvh.node_skip)
    first = np.asarray(bvh.node_first)
    cnt = np.asarray(bvh.node_count)
    lv0, lv1, lv2 = v0[perm], v1[perm], v2[perm]
    le1, le2 = lv1 - lv0, lv2 - lv0

    plb = subtrees.build_perlane(nmin, nmax, skip, first, cnt,
                                 lv0, le1, le2, prim_ids=perm,
                                 cap_tris=cap)
    assert plb.n_sub >= 2

    rng = np.random.default_rng(7)
    miss = hit = 0
    for _ in range(60):
        o = rng.uniform(-6, 6, 3)
        aim = rng.uniform(-3, 3, 3)          # aim into the scene
        d = aim - o if rng.random() < 0.8 else rng.normal(size=3)
        d /= np.linalg.norm(d)
        bt, bp = _brute(v0, v1 - v0, v2 - v0, o, d, 1e-5, 1e30)
        wt, wp = subtrees.reference_walk(plb, o, d, 1e-5, 1e30)
        if bp < 0:
            assert wp < 0
            miss += 1
        else:
            assert wp == bp, (wp, bp)
            np.testing.assert_allclose(wt, bt, rtol=2e-4)
            hit += 1
    assert hit >= 10 and miss >= 1


def test_cut_respects_caps():
    v0, v1, v2 = _soup(4000, seed=3)
    bvh, perm = build_bvh(v0, v1, v2, leaf_size=8, pack=False)
    skip = np.asarray(bvh.node_skip)
    cnt = np.asarray(bvh.node_count)
    roots, lo, hi = subtrees.cut_subtrees(skip, cnt)
    for k, r in enumerate(roots):
        assert hi[k] - lo[k] <= subtrees.CAP or cnt[r] > 0
        assert skip[r] - r <= subtrees.CAP
    # subtrees are disjoint and cover every LEAF (ancestor nodes above
    # the roots are intentionally outside every subtree)
    covered = np.zeros(len(skip), bool)
    for r in roots:
        assert not covered[r:skip[r]].any()
        covered[r:skip[r]] = True
    assert covered[cnt > 0].all()
    assert (np.diff(lo) >= 0).all()
