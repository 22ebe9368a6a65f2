"""Composite semantics (shaders/final.frag) + per-pass run toggles."""
import jax.numpy as jnp
import numpy as np

from evplp_tpu.runtime import film
from evplp_tpu.runtime.loop import run_photon_fam
from evplp_tpu.scene.config import load_config
from evplp_tpu.scene.export import write_cornell_config


def test_composite_masks_gi_where_emitter_visible():
    vpl = jnp.ones((4, 3)) * 2.0
    photon = jnp.ones((4, 3)) * 3.0
    light = jnp.zeros((4, 3)).at[1].set(jnp.asarray([7.0, 7.0, 7.0]))
    out = np.asarray(film.composite(vpl, photon, light))
    # emitter pixel: GI masked, light only (final.frag:26)
    np.testing.assert_allclose(out[1], [7, 7, 7])
    # others: vpl + photon
    np.testing.assert_allclose(out[0], [5, 5, 5])


def test_composite_scales_and_gamma():
    vpl = jnp.ones((2, 3)) * 4.0
    z = jnp.zeros((2, 3))
    out = np.asarray(film.composite(vpl, z, z, vpl_scale=0.25, gamma=True))
    np.testing.assert_allclose(out, np.ones((2, 3)), atol=1e-6)


def test_run_pass_toggles(tmp_path):
    base = dict(rngOffset=0, numMaxIteration=1, timeLimitMs=-1.0,
                frameMode="accumulate", useJitter=False, useStat=False,
                statFilename="", numLightPaths=32, numVplLightPaths=4,
                numMaxBounces=1, radiusPercentage=0.05,
                combinedFilename="", weightedPhotonFilename="",
                weightedVplFilename="")
    # photonSplat off -> photon image identically zero
    block = dict(base, run={"photonSplat": False})
    p = write_cornell_config(str(tmp_path), block, "photonfam", res=8,
                             name="t1")
    r = run_photon_fam(load_config(p))
    assert np.all(r.images["weighted_photon"] == 0)
    assert r.images["weighted_vpl"].max() > 0
    # vplSplat off -> vpl part zero (weighted_vpl = light image only)
    block = dict(base, run={"vplSplat": False, "lightRender": False})
    p = write_cornell_config(str(tmp_path), block, "photonfam", res=8,
                             name="t2")
    r = run_photon_fam(load_config(p))
    assert np.all(r.images["weighted_vpl"] == 0)
    assert r.images["weighted_photon"].max() > 0
