"""Per-lane two-level trace vs the dense oracle (interpret mode).

perlane_trace must agree with intersect_closest_brute elementwise on
closest hits (t, prim, u, v) and with the dense any-hit on occlusion
— including rays with empty intervals and total misses."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evplp_tpu.accel.bvh import build_bvh
from evplp_tpu.accel import subtrees
from evplp_tpu.trace import perlane
from evplp_tpu.trace.intersect import Triangles, intersect_closest_brute


def _scene(n=1500, seed=0, spread=4.0):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    v1 = v0 + rng.normal(0, 0.4, (n, 3)).astype(np.float32)
    v2 = v0 + rng.normal(0, 0.4, (n, 3)).astype(np.float32)
    bvh, perm = build_bvh(v0, v1, v2, leaf_size=4, pack=False)
    lv0, lv1, lv2 = v0[perm], v1[perm], v2[perm]
    plb = subtrees.build_perlane(
        np.asarray(bvh.node_min), np.asarray(bvh.node_max),
        np.asarray(bvh.node_skip), np.asarray(bvh.node_first),
        np.asarray(bvh.node_count), lv0, lv1 - lv0, lv2 - lv0,
        prim_ids=perm)
    tris = Triangles(v0=jnp.asarray(v0), e1=jnp.asarray(v1 - v0),
                     e2=jnp.asarray(v2 - v0),
                     n=jnp.zeros_like(jnp.asarray(v0)))
    return plb, tris


def _rays(n, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    aim = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = np.where(rng.random((n, 1)) < 0.8, aim - o,
                 rng.normal(size=(n, 3))).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_perlane_closest_matches_oracle():
    perlane.set_interpret(True)
    plb, tris = _scene()
    n = 2048
    o, d = _rays(n)
    t_min = jnp.full((n,), 1e-4, jnp.float32)
    t_max = jnp.full((n,), 3.0e38, jnp.float32)
    # a few dead lanes must stay misses
    t_max = t_max.at[:16].set(0.0)

    t, prim, u, v = perlane.perlane_trace(plb, o, d, t_min, t_max,
                                          n_sub=plb.n_sub)
    oracle = intersect_closest_brute(tris, o, d, t_min=1e-4, t_max=3.0e38)

    t, prim, u, v = map(np.asarray, (t, prim, u, v))
    ot, op = np.asarray(oracle.t), np.asarray(oracle.prim)
    assert (prim[:16] == -1).all()
    live = np.arange(n) >= 16
    hits = live & (op >= 0)
    assert hits.sum() > n // 4
    np.testing.assert_array_equal(prim[live], np.where(op[live] >= 0,
                                                       op[live], -1))
    np.testing.assert_allclose(t[hits], ot[hits], rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(u[hits], np.asarray(oracle.u)[hits],
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(v[hits], np.asarray(oracle.v)[hits],
                               rtol=1e-3, atol=1e-4)


def test_perlane_any_hit_matches_oracle():
    perlane.set_interpret(True)
    plb, tris = _scene(seed=2)
    n = 1024
    o, d = _rays(n, seed=3)
    t_min = jnp.full((n,), 1e-4, jnp.float32)
    t_max = jnp.full((n,), 5.0, jnp.float32)

    t, prim, u, v = perlane.perlane_trace(plb, o, d, t_min, t_max,
                                          n_sub=plb.n_sub, any_hit=True)
    oracle = intersect_closest_brute(tris, o, d, t_min=1e-4, t_max=5.0)
    got = np.asarray(prim) >= 0
    want = np.asarray(oracle.prim) >= 0
    np.testing.assert_array_equal(got, want)
    assert want.sum() > 50
