"""BVH build + traversal vs brute-force oracle; segment occlusion."""
import jax
import jax.numpy as jnp
import numpy as np

from evplp_tpu.accel.bvh import build_bvh
from evplp_tpu.scene.procedural import cornell_box
from evplp_tpu.trace.intersect import (
    Triangles, intersect_any, intersect_closest, intersect_closest_brute,
    occluded_segment,
)


def _random_tris(n, key):
    k1, k2, k3 = jax.random.split(key, 3)
    base = jax.random.uniform(k1, (n, 3), minval=-1, maxval=1)
    e1 = jax.random.normal(k2, (n, 3)) * 0.2
    e2 = jax.random.normal(k3, (n, 3)) * 0.2
    v0 = np.asarray(base)
    v1 = np.asarray(base + e1)
    v2 = np.asarray(base + e2)
    return v0, v1, v2


def _to_triangles(v0, v1, v2):
    e1 = v1 - v0
    e2 = v2 - v0
    n = np.cross(e1, e2)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    return Triangles(v0=jnp.asarray(v0), e1=jnp.asarray(e1),
                     e2=jnp.asarray(e2), n=jnp.asarray(n.astype(np.float32)))


def test_bvh_structure():
    v0, v1, v2 = _random_tris(300, jax.random.PRNGKey(0))
    bvh, perm = build_bvh(v0, v1, v2)
    assert sorted(perm.tolist()) == list(range(300))
    counts = np.asarray(bvh.node_count)
    firsts = np.asarray(bvh.node_first)
    # leaves cover all triangles exactly once
    covered = np.zeros(300, bool)
    for f, c in zip(firsts, counts):
        if c > 0:
            assert not covered[f:f + c].any()
            covered[f:f + c] = True
    assert covered.all()
    # skip pointers are monotone and in range
    skips = np.asarray(bvh.node_skip)
    n = len(counts)
    assert (skips > np.arange(n)).all() and (skips <= n).all()


def test_closest_hit_matches_brute_force():
    key = jax.random.PRNGKey(1)
    v0, v1, v2 = _random_tris(257, key)
    bvh, perm = build_bvh(v0, v1, v2)
    tris = _to_triangles(v0[perm], v1[perm], v2[perm])

    ko, kd_ = jax.random.split(jax.random.PRNGKey(2))
    o = jax.random.uniform(ko, (512, 3), minval=-2, maxval=2)
    d = jax.random.normal(kd_, (512, 3))

    hit = intersect_closest(tris, bvh, o, d)
    ref = intersect_closest_brute(tris, o, d)

    np.testing.assert_array_equal(np.asarray(hit.prim >= 0),
                                  np.asarray(ref.prim >= 0))
    m = np.asarray(hit.prim >= 0)
    np.testing.assert_allclose(np.asarray(hit.t)[m], np.asarray(ref.t)[m],
                               rtol=1e-4)


def test_any_hit_consistent_with_closest():
    key = jax.random.PRNGKey(3)
    v0, v1, v2 = _random_tris(128, key)
    bvh, perm = build_bvh(v0, v1, v2)
    tris = _to_triangles(v0[perm], v1[perm], v2[perm])
    ko, kd_ = jax.random.split(jax.random.PRNGKey(4))
    o = jax.random.uniform(ko, (256, 3), minval=-2, maxval=2)
    d = jax.random.normal(kd_, (256, 3))
    occ = intersect_any(tris, bvh, o, d, t_min=1e-4, t_max=1e4)
    hit = intersect_closest(tris, bvh, o, d, t_min=1e-4, t_max=1e4)
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(hit.prim >= 0))


def test_segment_occlusion_cornell():
    scene = cornell_box()
    # center of the room to a point just below the light: unoccluded
    p_from = jnp.asarray([[0.5, 0.5, 0.5]])
    p_to = jnp.asarray([[0.5, 0.99, 0.5]])
    occ = occluded_segment(scene.tris, scene.bvh, p_from, p_to)
    assert not bool(occ[0])
    # through the tall block: occluded
    p_from = jnp.asarray([[0.05, 0.3, 0.25]])
    p_to = jnp.asarray([[0.6, 0.3, 0.25]])
    occ = occluded_segment(scene.tris, scene.bvh, p_from, p_to)
    assert bool(occ[0])


def test_cornell_primary_rays():
    scene = cornell_box()
    o, d = scene.camera.generate_rays(32, 32)
    hit = intersect_closest(scene.tris, scene.bvh, o, d)
    # looking into an open-front box: everything hits
    assert bool(jnp.all(hit.prim >= 0))
    # center pixel hits the back wall (z=0 plane)
    c = 16 * 32 + 16
    p = np.asarray(o[c] + hit.t[c] * d[c])
    assert abs(p[2]) < 1e-3
