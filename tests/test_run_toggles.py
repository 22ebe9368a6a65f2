"""Per-pass `run` toggles (rtcomphoton.h:188-197) + display gamma.

Reference semantics honored here:
  * deferredShading=false  -> the G-buffer is never rendered: stencil 0
    everywhere, every estimator black.
  * lightTracing=false     -> the photon buffer is never written: no usable
    VPL/photon records, indirect passes black; the emitter raster still runs.
  * finalize=false         -> no-op for outputs: the reference's dumps call
    runFinalProgram themselves (rtcomphoton.h:1084,1121-1132); the toggle
    only gates the on-screen composite.
  * gamma                  -> dumps are linear by default (the reference
    passes doGammaCorrection=false for every dump); --gamma applies the
    final.frag display transform (pow 1/2.2).
"""
import jax.numpy as jnp
import numpy as np

from evplp_tpu.core.sampling import iteration_key
from evplp_tpu.integrators.photon_fam import (
    PhotonFamConfig, init_state, photon_fam_frame)
from evplp_tpu.scene.config import parse_technique_json
from evplp_tpu.scene.procedural import cornell_box

RES = 16


def _frame(**kw):
    scene = cornell_box()
    cfg = PhotonFamConfig(
        width=RES, height=RES, num_light_paths=64, num_vpl_light_paths=8,
        num_records=3, mis_mode=4, accumulate=True, use_jitter=False,
        splat_tile=4, splat_cap=256, splat_span=8, **kw)
    state = photon_fam_frame(scene, cfg, init_state(cfg), iteration_key(0, 0),
                             jnp.float32(0.08), jnp.float32(0.5),
                             jnp.float32(2.0), jnp.float32(0.0))
    return state


def test_all_passes_on():
    s = _frame()
    assert np.asarray(s.vpl_acc).max() > 0
    assert np.asarray(s.photon_acc).max() > 0
    assert np.asarray(s.light_img).max() > 0


def test_light_tracing_off():
    s = _frame(do_light_tracing=False)
    assert np.asarray(s.vpl_acc).max() == 0
    assert np.asarray(s.photon_acc).max() == 0
    # the emitter raster does not depend on the photon buffer
    assert np.asarray(s.light_img).max() > 0


def test_deferred_shading_off():
    s = _frame(do_deferred=False)
    assert np.asarray(s.vpl_acc).max() == 0
    assert np.asarray(s.photon_acc).max() == 0
    assert np.asarray(s.light_img).max() == 0


def test_run_block_parsed_into_config():
    p = parse_technique_json("photonfam", {
        "numLightPaths": 64, "numVplLightPaths": 8,
        "run": {"deferredShading": False, "lightTracing": False,
                "finalize": False, "vplSplat": True},
    })
    assert p.run_passes["deferredShading"] is False
    assert p.run_passes["lightTracing"] is False
    assert p.run_passes["finalize"] is False
    assert p.run_passes["vplSplat"] is True
    assert p.run_passes["photonSplat"] is True


def test_finalize_toggle_is_output_noop_and_gamma():
    from evplp_tpu.runtime.loop import finalize
    from evplp_tpu.scene.config import RenderJob

    scene = cornell_box()
    cfg_on = PhotonFamConfig(
        width=RES, height=RES, num_light_paths=64, num_vpl_light_paths=8,
        num_records=3, mis_mode=1, accumulate=True, use_jitter=False)
    state = photon_fam_frame(scene, cfg_on, init_state(cfg_on),
                             iteration_key(0, 0), jnp.float32(0.08),
                             jnp.float32(0.5), jnp.float32(2.0),
                             jnp.float32(0.0))
    job = RenderJob(scene=scene, width=RES, height=RES, params=None, raw={})

    import dataclasses
    cfg_off = dataclasses.replace(cfg_on, do_finalize=False)
    on = finalize(state, cfg_on, 1, job)
    off = finalize(state, cfg_off, 1, job)
    np.testing.assert_array_equal(on["combined"], off["combined"])

    g = finalize(state, cfg_on, 1, job, gamma=True)
    np.testing.assert_allclose(
        g["combined"], np.power(np.maximum(on["combined"], 0.0), 1 / 2.2),
        rtol=1e-6)
