"""Analytic furnace test — breaks the self-generated-ground-truth
circularity of the quality protocol (every MSE row compares against the
repo's own converged PT; a coherent PT bug would shift all of them).

Scene: procedural.furnace_scene — the whole [0,1]^3 cube interior is the
uniform area light (emitted radiance L_e = I, direction-independent at
phong exponent 0), with a Lambertian patch (albedo rho) at the center.
Closed form at any patch pixel, any view direction:

    L = rho * I

The test asserts the assembled estimators — PT, VPL (instant radiosity),
and EVPLP (clamped VPL + photon-splat compensation) — against that value
at loose tolerance.  The BRDF/warp unit tests cover the pieces; this
covers the assembled transport (MIS weights, pi conventions, the
arriving-flux record semantics, KDE normalization) end to end.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evplp_tpu.core.sampling import iteration_key
from evplp_tpu.integrators.gbuffer import trace_gbuffer
from evplp_tpu.integrators.photon_fam import (PhotonFamConfig, init_state,
                                              photon_fam_frame)
from evplp_tpu.integrators.pt import render_pt_frame
from evplp_tpu.scene.procedural import furnace_scene

RES = 16
INTENSITY = 2.0
ALBEDO = 0.65
EXPECTED = ALBEDO * INTENSITY


def _patch_mean(img_flat):
    """Mean radiance over the central pixel block (all pixels see the patch;
    the center block stays clear of any edge effects)."""
    img = np.asarray(img_flat).reshape(RES, RES, 3)
    q = RES // 4
    return img[q:-q, q:-q].mean(axis=(0, 1))


@pytest.fixture(scope="module")
def scene():
    return furnace_scene(intensity=INTENSITY, albedo=ALBEDO)


def test_furnace_pt(scene):
    iters = 48

    @jax.jit
    def frame(acc, key):
        gbuf = trace_gbuffer(scene, RES, RES, None)
        return acc + render_pt_frame(scene, gbuf, key, num_bounces=2)

    acc = jnp.zeros((RES * RES, 3), jnp.float32)
    for i in range(iters):
        acc = frame(acc, iteration_key(0, i))
    mean = _patch_mean(acc / iters)
    np.testing.assert_allclose(mean, EXPECTED, rtol=0.05)


def _photon_fam_mean(scene, cfg, radius, clamp, pdf_mc, iters):
    state = init_state(cfg)
    for i in range(iters):
        state = photon_fam_frame(
            scene, cfg, state, iteration_key(0, i), jnp.float32(radius),
            jnp.float32(clamp), jnp.float32(pdf_mc), jnp.float32(0.0))
    assert int(state.dropped) == 0
    return _patch_mean((state.vpl_acc + state.photon_acc) / iters)


def test_furnace_vpl(scene):
    # pure instant radiosity: misMode "one", no photon pass
    # (conference_vpl.json's shape at test scale)
    cfg = PhotonFamConfig(
        width=RES, height=RES, num_light_paths=64, num_vpl_light_paths=64,
        num_records=3, mis_mode=0, accumulate=True, use_jitter=False,
        do_photon=False)
    mean = _photon_fam_mean(scene, cfg, radius=1e-6, clamp=0.0, pdf_mc=1.0,
                            iters=24)
    np.testing.assert_allclose(mean, EXPECTED, rtol=0.08)


def test_furnace_evplp(scene):
    # the paper's technique: geometry-clamped VPL + photon compensation
    # (misMode geometryClamp).  The clamp (1/totalArea) removes most of the
    # near-field VPL energy here (G up to ~25 vs b~0.14), so the photon
    # splat supplies the bulk — this exercises BOTH estimators and their
    # complementarity.
    paths = 4096
    vpl = 32
    radius = scene.bounding_radius * 0.08
    pdf_mc = (vpl / paths) / np.pi / (radius * radius)
    cfg = PhotonFamConfig(
        width=RES, height=RES, num_light_paths=paths,
        num_vpl_light_paths=vpl, num_records=3, mis_mode=4,
        accumulate=True, use_jitter=False,
        splat_tile=8, splat_cap=1 << 16, splat_span=3)
    mean = _photon_fam_mean(scene, cfg, radius=radius,
                            clamp=1.0 / scene.total_area, pdf_mc=pdf_mc,
                            iters=12)
    np.testing.assert_allclose(mean, EXPECTED, rtol=0.12)
