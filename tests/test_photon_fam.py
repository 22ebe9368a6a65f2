"""Photon-family estimator tests: VPL vs quadrature, photon-splat KDE vs
quadrature, tiled-vs-dense splat equality, and the EVPLP energy-compensation
identity (clamped VPL + photon residual == unclamped VPL)."""
import jax
import jax.numpy as jnp
import numpy as np

from evplp_tpu.core.sampling import iteration_key
from evplp_tpu.integrators.gbuffer import trace_gbuffer
from evplp_tpu.integrators.light_trace import (
    FLAG_PHOTON, FLAG_VPL, trace_light_paths)
from evplp_tpu.integrators.photon_splat import (
    photon_splat_dense, photon_splat_tiled)
from evplp_tpu.integrators.vpl import vpl_gather
from evplp_tpu.scene.procedural import cornell_box, plane_light_scene
from tests.test_pt import _direct_quadrature

RES = 16


def _center(res=RES):
    return (res // 2) * res + res // 2


def test_light_trace_records():
    scene = plane_light_scene()
    pm = trace_light_paths(scene, iteration_key(0, 0), 512, 4)
    flags = np.asarray(pm.flags)
    # vertex 0: always a VPL on the light
    assert (flags[:, 0] == FLAG_VPL).all()
    pos0 = np.asarray(pm.pos[:, 0])
    assert np.allclose(pos0[:, 1], 2.0, atol=1e-5)
    # vertex 1: photons land on the floor (y=0) when the path survives
    ok1 = flags[:, 1] != 0
    assert ok1.mean() > 0.5  # downward power-cosine: most paths hit the floor
    pos1 = np.asarray(pm.pos[:, 1])[ok1]
    assert np.allclose(pos1[:, 1], 0.0, atol=1e-4)
    assert (flags[ok1, 1] & FLAG_VPL).all() and (flags[ok1, 1] & FLAG_PHOTON).all()
    # flux at vertex 1 = emitted flux (intensity*area*(n+2)/(n+1)*cos)
    flux1 = np.asarray(pm.flux[:, 1])[ok1]
    assert (flux1 > 0).all()
    # last vertex is photon-only when usable
    okl = flags[:, 3] != 0
    if okl.any():
        assert not (flags[okl, 3] & FLAG_VPL).any()


def test_vpl_mode0_matches_quadrature():
    scene = plane_light_scene()
    gbuf = trace_gbuffer(scene, RES, RES)
    frames = 24
    acc = jnp.zeros((RES * RES, 3))
    for i in range(frames):
        pm = trace_light_paths(scene, iteration_key(0, i), 256, 4)
        acc += vpl_gather(scene, gbuf, pm, mis_mode=0,
                          pdf_mc=jnp.float32(0.0),
                          clamping_value=jnp.float32(0.0), num_vpl_paths=256)
    img = np.asarray(acc / frames)
    c = _center()
    p = np.asarray(gbuf.position[c])
    kd = np.asarray(gbuf.kd[c])[0]
    ref = _direct_quadrature(scene, p, np.array([0, 1, 0.0]), kd)
    np.testing.assert_allclose(img[c], ref, rtol=0.12)


def test_photon_splat_dense_matches_quadrature():
    scene = plane_light_scene()
    gbuf = trace_gbuffer(scene, RES, RES)
    radius = jnp.float32(0.25)
    paths = 8192
    frames = 8
    acc = jnp.zeros((RES * RES, 3))
    for i in range(frames):
        pm = trace_light_paths(scene, iteration_key(1, i), paths, 4)
        acc += photon_splat_dense(scene, gbuf, pm, radius, 0,
                                  jnp.float32(0.0), jnp.float32(0.0),
                                  jnp.float32(1.0 / paths))
    img = np.asarray(acc / frames)
    # evaluate at the pixel nearest the light spot's center: the image
    # center maps ~2.6 m away, where photon counts are tiny and the convex
    # 1/d^4 falloff makes the disc-KDE bias large and positive; under the
    # light the irradiance is locally flat, so bias and noise are small
    pos = np.asarray(gbuf.position)
    c = int(np.argmin(pos[:, 0] ** 2 + pos[:, 2] ** 2))
    p = pos[c]
    kd = np.asarray(gbuf.kd[c])[0]
    ref = _direct_quadrature(scene, p, np.array([0, 1, 0.0]), kd)
    # KDE bias + MC noise: loose tolerance
    np.testing.assert_allclose(img[c], ref, rtol=0.15)


def test_tiled_splat_equals_dense():
    scene = cornell_box()
    gbuf = trace_gbuffer(scene, RES, RES)
    pm = trace_light_paths(scene, iteration_key(2, 0), 512, 4)
    radius = jnp.float32(0.08)
    for mis_mode in (0, 1, 2, 3, 4, 5):
        args = (radius, mis_mode, jnp.float32(2.0), jnp.float32(0.5),
                jnp.float32(1.0 / 512))
        dense = np.asarray(photon_splat_dense(scene, gbuf, pm, *args))
        tiled, dropped = photon_splat_tiled(
            scene, gbuf, pm, *args, RES, RES, None,
            tile=4, cap=512, span=16)
        assert int(dropped) == 0
        np.testing.assert_allclose(np.asarray(tiled), dense,
                                   rtol=1e-4, atol=1e-6)


def test_evplp_compensation_identity():
    """mode-4 clamped VPL + mode-4 photon residual ~= mode-0 full VPL."""
    scene = plane_light_scene()
    gbuf = trace_gbuffer(scene, RES, RES)
    paths = 2048
    radius = jnp.float32(0.35)
    clamp = jnp.float32(0.08)
    frames = 6
    full = jnp.zeros((RES * RES, 3))
    clamped = jnp.zeros((RES * RES, 3))
    resid = jnp.zeros((RES * RES, 3))
    nvpl = 256
    for i in range(frames):
        pm = trace_light_paths(scene, iteration_key(3, i), paths, 4)
        pdf_mc = jnp.float32(0.0)
        full += vpl_gather(scene, gbuf, pm, 0, pdf_mc, clamp, nvpl)
        clamped += vpl_gather(scene, gbuf, pm, 4, pdf_mc, clamp, nvpl)
        resid += photon_splat_dense(scene, gbuf, pm, radius, 4, pdf_mc,
                                    clamp, jnp.float32(1.0 / paths))
    full = np.asarray(full / frames)
    comp = np.asarray((clamped + resid) / frames)
    c = _center()
    # compare at the center pixel (KDE bias ~ radius; tolerance loose)
    np.testing.assert_allclose(comp[c], full[c], rtol=0.25)
    # and the clamped part alone must be strictly below the full estimate
    assert (np.asarray(clamped / frames)[c] <= full[c] + 1e-6).all()


def test_balance_mis_combination_is_complete():
    """Balance-mode VPL + balance-mode photon splat ~= unclamped VPL:
    the two estimators' MIS weights are complementary (balance(pdfMc,pdfDe)
    + balance(pdfDe,pdfMc) == 1), so their sum recovers full transport up
    to KDE bias + MC noise."""
    scene = plane_light_scene()
    gbuf = trace_gbuffer(scene, RES, RES)
    paths = 2048
    nvpl = 256
    radius = jnp.float32(0.35)
    pdf_mc = jnp.float32((nvpl / paths) / np.pi / (0.35 ** 2))
    frames = 6
    full = jnp.zeros((RES * RES, 3))
    comb = jnp.zeros((RES * RES, 3))
    for i in range(frames):
        pm = trace_light_paths(scene, iteration_key(4, i), paths, 4)
        full += vpl_gather(scene, gbuf, pm, 0, pdf_mc, jnp.float32(0.0), nvpl)
        comb += vpl_gather(scene, gbuf, pm, 1, pdf_mc, jnp.float32(0.0), nvpl)
        comb += photon_splat_dense(scene, gbuf, pm, radius, 1, pdf_mc,
                                   jnp.float32(0.0), jnp.float32(1.0 / paths))
    c = _center()
    np.testing.assert_allclose(np.asarray(comb / frames)[c],
                               np.asarray(full / frames)[c], rtol=0.25)


def test_tiled_splat_hot_tile_overflow_equals_dense():
    """Force the bulk/overflow split: photons CLUSTERED into a few screen
    tiles on a film with >64 tiles (the dynamic bulk cap bottoms out and
    the compact overflow batch drains the hot tiles) — must still equal
    the dense oracle with zero drops."""
    import dataclasses
    res = 64
    scene = cornell_box()
    gbuf = trace_gbuffer(scene, res, res)
    pm = trace_light_paths(scene, iteration_key(7, 0), 512, 4)
    # cluster every record at one visible surface point (floor center):
    # all pairs land in a couple of 4-px tiles of the 16x16 tile grid
    floor_p = jnp.asarray([0.5, 0.0, 0.5], jnp.float32)
    pos = jnp.broadcast_to(floor_p, pm.pos.shape) \
        + 1e-3 * jax.random.normal(iteration_key(7, 1), pm.pos.shape)
    pm = dataclasses.replace(pm, pos=pos)

    radius = jnp.float32(0.05)
    for mis_mode in (1, 4):
        args = (radius, mis_mode, jnp.float32(2.0), jnp.float32(0.5),
                jnp.float32(1.0 / 512))
        dense = np.asarray(photon_splat_dense(scene, gbuf, pm, *args))
        tiled, dropped = photon_splat_tiled(
            scene, gbuf, pm, *args, res, res, None,
            tile=4, cap=8192, span=16)
        assert int(dropped) == 0
        np.testing.assert_allclose(np.asarray(tiled), dense,
                                   rtol=1e-4, atol=1e-6)
