"""Native (C++) BVH builder vs numpy builder: structural validity +
identical traversal results."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evplp_tpu.accel import bvh as bvh_mod
from evplp_tpu.trace.intersect import Triangles, intersect_closest

try:
    from evplp_tpu.native import bvh_native
    bvh_native._get_lib()
    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="g++ unavailable")


def _random_tris(n, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.2, (n, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.2, (n, 3)).astype(np.float32)
    return base, base + e1, base + e2


def test_native_structure():
    v0, v1, v2 = _random_tris(777)
    nmin, nmax, skip, first, count, perm = bvh_native.build(v0, v1, v2, 8)
    n = len(count)
    assert sorted(perm.tolist()) == list(range(777))
    covered = np.zeros(777, bool)
    for f, c in zip(first, count):
        if c > 0:
            assert not covered[f:f + c].any()
            covered[f:f + c] = True
    assert covered.all()
    assert (skip > np.arange(n)).all() and (skip <= n).all()
    assert skip[0] == n  # root subtree covers everything
    # parent boxes contain children (DFS: child of internal i is i+1)
    for i in range(n):
        if count[i] == 0:
            j = i + 1
            assert (nmin[i] <= nmin[j] + 1e-6).all()
            assert (nmax[i] >= nmax[j] - 1e-6).all()


def _mk_bvh(nmin, nmax, skip, first, count):
    import numpy as _np
    return bvh_mod.BVH(
        node_min=jnp.asarray(nmin), node_max=jnp.asarray(nmax),
        node_skip=jnp.asarray(skip), node_first=jnp.asarray(first),
        node_count=jnp.asarray(count),
        pk_tri_rows=jnp.zeros((1, 128)), pk_meta=jnp.zeros((1, 4), jnp.int32),
        pk_bounds=jnp.zeros((1, 8)),
        pk_prim_map=jnp.full((8,), -1, jnp.int32),
        )


def test_native_traversal_matches_numpy_build():
    v0, v1, v2 = _random_tris(333, seed=3)

    nmin, nmax, skip, first, count, perm = bvh_native.build(v0, v1, v2, 8)
    bvh_n = _mk_bvh(nmin, nmax, skip, first, count)

    def tris_for(perm_):
        a, b, c = v0[perm_], v1[perm_], v2[perm_]
        e1, e2 = b - a, c - a
        nrm = np.cross(e1, e2)
        nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)
        return Triangles(v0=jnp.asarray(a), e1=jnp.asarray(e1),
                         e2=jnp.asarray(e2), n=jnp.asarray(nrm.astype(np.float32)))

    # force the BVH path (scene above brute threshold not needed — call the
    # traversal directly through a large t-range comparison vs numpy build)
    bvh_py, perm_py = bvh_mod._build_topology(v0, v1, v2, 8), None
    nmin2, nmax2, children, first2, count2, perm2 = bvh_py
    nmin2, nmax2, skip2, first2, count2 = bvh_mod._flatten_dfs(
        nmin2, nmax2, children, first2, count2)
    bvh_p = _mk_bvh(nmin2, nmax2, skip2, first2, count2)

    rng = np.random.default_rng(7)
    o = jnp.asarray(rng.uniform(-2, 2, (256, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(0, 1, (256, 3)).astype(np.float32))

    from evplp_tpu.trace.intersect import _traverse_one
    f_native = jax.vmap(lambda oo, dd: _traverse_one(
        tris_for(perm), bvh_n, oo, dd, jnp.float32(1e-4), jnp.float32(3e38),
        False, 8))
    f_numpy = jax.vmap(lambda oo, dd: _traverse_one(
        tris_for(perm2), bvh_p, oo, dd, jnp.float32(1e-4), jnp.float32(3e38),
        False, 8))
    t1, p1, _, _ = f_native(o, d)
    t2, p2, _, _ = f_numpy(o, d)
    np.testing.assert_array_equal(np.asarray(p1 >= 0), np.asarray(p2 >= 0))
    m = np.asarray(p1 >= 0)
    np.testing.assert_allclose(np.asarray(t1)[m], np.asarray(t2)[m], rtol=1e-5)
