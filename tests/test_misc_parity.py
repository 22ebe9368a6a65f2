"""Parity odds-and-ends: Aabb toolkit, AnimationCamera, PT writeEveryFrame."""
import os

import jax.numpy as jnp
import numpy as np

from evplp_tpu.scene.camera import AnimationCamera, Camera
from evplp_tpu.utils import aabb


def test_aabb_basics():
    a = aabb.from_points(jnp.asarray([[0, 0, 0], [1, 2, 3.0]]))
    b = aabb.from_points(jnp.asarray([[0.5, 0.5, 0.5], [2, 1, 1.0]]))
    u = aabb.union(a, b)
    np.testing.assert_allclose(np.asarray(u.lo), [0, 0, 0])
    np.testing.assert_allclose(np.asarray(u.hi), [2, 2, 3])
    i = aabb.intersect(a, b)
    np.testing.assert_allclose(np.asarray(i.lo), [0.5, 0.5, 0.5])
    np.testing.assert_allclose(np.asarray(i.hi), [1, 1, 1])
    assert bool(aabb.is_valid(i))
    np.testing.assert_allclose(float(aabb.diagonal_length2(a)), 1 + 4 + 9)
    np.testing.assert_allclose(float(aabb.surface_area(a)),
                               2 * (1 * 2 + 2 * 3 + 3 * 1))
    assert bool(aabb.contains(a, jnp.asarray([0.5, 1.0, 2.0])))
    assert not bool(aabb.contains(a, jnp.asarray([2.0, 0.0, 0.0])))


def test_aabb_transform_translation():
    a = aabb.from_points(jnp.asarray([[0, 0, 0], [1, 1, 1.0]]))
    m = jnp.eye(4).at[:3, 3].set(jnp.asarray([1.0, 2.0, 3.0]))
    out = aabb.transform(a, m)
    np.testing.assert_allclose(np.asarray(out.lo), [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.hi), [2, 3, 4], atol=1e-6)


def test_max_cos_bound():
    a = aabb.from_points(jnp.asarray([[1, -0.5, -0.5], [2, 0.5, 0.5]]))
    origin = jnp.asarray([0.0, 0.0, 0.0])
    # box straight along +x: bound must be >= cos to center and <= 1
    bound = float(aabb.max_cos_bound(a, origin, jnp.asarray([1.0, 0.0, 0.0])))
    assert 0.9 < bound <= 1.0
    # origin inside -> bound 1
    inside = aabb.from_points(jnp.asarray([[-1, -1, -1], [1, 1, 1.0]]))
    assert float(aabb.max_cos_bound(inside, origin,
                                    jnp.asarray([1.0, 0, 0]))) == 1.0


def test_animation_camera_lerp():
    c0 = Camera((0, 0, 0), (0, 0, -1), (0, 1, 0), 1.0, 1.0)
    c1 = Camera((2, 0, 0), (2, 0, -1), (0, 1, 0), 0.5, 1.0)
    anim = AnimationCamera(c0, c1, total_time_ms=100.0)
    mid = anim.at(50.0)
    np.testing.assert_allclose(mid.origin, (1, 0, 0))
    np.testing.assert_allclose(mid.fovy, 0.75)
    assert anim.at(-5.0).origin == c0.origin
    assert anim.at(500.0).origin == c1.origin


def test_pt_write_every_frame(tmp_path):
    from evplp_tpu.runtime.loop import run_pt
    from evplp_tpu.scene.config import load_config
    from evplp_tpu.scene.export import write_cornell_config

    block = dict(rngOffset=0, numMaxIteration=2, timeLimitMs=-1.0,
                 frameMode="accumulate", useJitter=False, useStat=False,
                 statFilename="", numSamplePerPixel=1, numMaxBounces=1,
                 writeEveryFrame=True,
                 outputFilename=os.path.join(str(tmp_path), "o.pfm"))
    cfg = write_cornell_config(str(tmp_path), block, "pt", res=8, name="wef")
    run_pt(load_config(cfg))
    assert os.path.exists(os.path.join(str(tmp_path), "o_1.pfm"))
    assert os.path.exists(os.path.join(str(tmp_path), "o_2.pfm"))
    assert os.path.exists(os.path.join(str(tmp_path), "o.pfm"))
