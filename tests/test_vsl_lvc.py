"""VSL and LVC estimator checks.

VSL with a small radius approaches the VPL estimate (the cone collapses to
the point-light direction); LVC converges to the same mean as the plain VPL
gather (it is the same estimator with randomized path selection).
"""
import jax
import jax.numpy as jnp
import numpy as np

from evplp_tpu.core.sampling import iteration_key
from evplp_tpu.integrators.gbuffer import trace_gbuffer
from evplp_tpu.integrators.light_trace import trace_light_paths
from evplp_tpu.integrators.lvc import lvc_gather
from evplp_tpu.integrators.vpl import vpl_gather
from evplp_tpu.integrators.vsl import vsl_gather
from evplp_tpu.scene.procedural import plane_light_scene

RES = 12


def test_vsl_small_radius_approaches_vpl():
    scene = plane_light_scene()
    gbuf = trace_gbuffer(scene, RES, RES)
    frames = 4
    acc_vsl = jnp.zeros((RES * RES, 3))
    acc_vpl = jnp.zeros((RES * RES, 3))
    for i in range(frames):
        pm = trace_light_paths(scene, iteration_key(5, i), 64, 3)
        acc_vpl += vpl_gather(scene, gbuf, pm, 0, jnp.float32(0.0),
                              jnp.float32(0.0), 64)
        acc_vsl += vsl_gather(scene, gbuf, pm, iteration_key(6, i),
                              jnp.float32(0.02), 64)
    vpl = np.asarray(acc_vpl / frames)
    vsl = np.asarray(acc_vsl / frames)
    assert np.isfinite(vsl).all() and (vsl >= 0).all()
    # compare on well-lit pixels only (MC noise on both sides)
    m = vpl[:, 0] > np.percentile(vpl[:, 0], 60)
    ratio = vsl[m].sum() / vpl[m].sum()
    assert 0.7 < ratio < 1.3, ratio


def test_lvc_matches_vpl_in_expectation():
    scene = plane_light_scene()
    gbuf = trace_gbuffer(scene, RES, RES)
    frames = 12
    acc_lvc = jnp.zeros((RES * RES, 3))
    acc_vpl = jnp.zeros((RES * RES, 3))
    for i in range(frames):
        pm = trace_light_paths(scene, iteration_key(8, i), 64, 3)
        acc_vpl += vpl_gather(scene, gbuf, pm, 0, jnp.float32(0.0),
                              jnp.float32(0.0), 64)
        # LVC over the full pool with numVpl == numPaths covers every path
        # exactly once per pixel -> identical estimator
        acc_lvc += lvc_gather(scene, gbuf, pm, iteration_key(9, i), 0,
                              jnp.float32(0.0), jnp.float32(0.0), 64)
    vpl = np.asarray(acc_vpl / frames)
    lvc = np.asarray(acc_lvc / frames)
    np.testing.assert_allclose(lvc, vpl, rtol=1e-4, atol=1e-7)


def test_vsl_pixel_sort_is_exact():
    """Difficulty-sorted chunked evaluation == unsorted evaluation, to the
    bit (per-pixel RNG is counter-based on the global pixel id, and the
    chunk bounds only skip sample indices that were masked to zero)."""
    from evplp_tpu.scene.procedural import cornell_box
    scene = cornell_box()
    res = 40                              # 1600 px: sorted path active
    gbuf = trace_gbuffer(scene, res, res)
    pm = trace_light_paths(scene, iteration_key(7, 0), 32, 3)
    r = jnp.float32(0.08)
    a = vsl_gather(scene, gbuf, pm, iteration_key(8, 0), r, 32,
                   pixel_sort=True)
    b = vsl_gather(scene, gbuf, pm, iteration_key(8, 0), r, 32,
                   pixel_sort=False)
    a, b = np.asarray(a), np.asarray(b)
    assert a.max() > 0
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
