"""Pluecker/MXU intersection strategy vs the Moller-Trumbore oracle."""
import jax.numpy as jnp
import numpy as np

from evplp_tpu.trace.intersect import Triangles, intersect_closest_brute
from evplp_tpu.trace.mxu import build_pluecker, mxu_any, mxu_closest


def _tris(n=97, seed=0):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.3, (n, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.3, (n, 3)).astype(np.float32)
    nrm = np.cross(e1, e2)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)
    return Triangles(v0=jnp.asarray(v0), e1=jnp.asarray(e1),
                     e2=jnp.asarray(e2), n=jnp.asarray(nrm.astype(np.float32)))


def test_mxu_closest_matches_mt():
    tris = _tris()
    pt = build_pluecker(tris.v0, tris.e1, tris.e2)
    rng = np.random.default_rng(1)
    o = jnp.asarray(rng.uniform(-2, 2, (400, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(0, 1, (400, 3)).astype(np.float32))
    tmin = jnp.full((400,), 1e-4)
    tmax = jnp.full((400,), 3.0e38)
    t, prim, u, v = mxu_closest(pt, o, d, tmin, tmax)
    ref = intersect_closest_brute(tris, o, d, t_min=1e-4, t_max=3.0e38)
    np.testing.assert_array_equal(np.asarray(prim >= 0),
                                  np.asarray(ref.prim >= 0))
    m = np.asarray(prim >= 0)
    np.testing.assert_array_equal(np.asarray(prim)[m], np.asarray(ref.prim)[m])
    np.testing.assert_allclose(np.asarray(t)[m], np.asarray(ref.t)[m],
                               rtol=2e-4)
    # barycentrics match Moller-Trumbore's (e1, e2) weights
    np.testing.assert_allclose(np.asarray(u)[m], np.asarray(ref.u)[m],
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(v)[m], np.asarray(ref.v)[m],
                               atol=2e-4)


def test_mxu_any_matches_closest():
    tris = _tris(n=60, seed=3)
    pt = build_pluecker(tris.v0, tris.e1, tris.e2)
    rng = np.random.default_rng(4)
    o = jnp.asarray(rng.uniform(-2, 2, (300, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(0, 1, (300, 3)).astype(np.float32))
    tmin = jnp.full((300,), 1e-3)
    tmax = jnp.full((300,), 1.5)
    occ = mxu_any(pt, o, d, tmin, tmax)
    _, prim, _, _ = mxu_closest(pt, o, d, tmin, tmax)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(prim >= 0))
