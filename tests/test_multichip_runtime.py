"""End-to-end multi-chip run through the driver (8 virtual CPU devices)."""
import jax
import numpy as np
import pytest

from evplp_tpu.parallel.shard import make_mesh
from evplp_tpu.runtime.loop import run_photon_fam
from evplp_tpu.scene.config import load_config
from evplp_tpu.scene.export import write_cornell_config

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_driver_sharded_run(tmp_path):
    block = dict(
        rngOffset=0, numMaxIteration=3, timeLimitMs=-1.0,
        frameMode="accumulate", useJitter=True, useStat=False,
        statFilename="", numLightPaths=64, numVplLightPaths=8,
        numMaxBounces=2, radiusPercentage=0.05, DoProgressive=True,
        combinedFilename="", weightedPhotonFilename="", weightedVplFilename="",
    )
    path = write_cornell_config(str(tmp_path), block, "photonfam",
                                res=16, name="mc")
    job = load_config(path)
    res = run_photon_fam(job, mesh=make_mesh(8))
    assert res.num_iterations == 3
    img = res.images["combined"]
    assert img.shape == (16, 16, 3)
    assert np.isfinite(img).all() and (img >= 0).all() and img.max() > 0


def test_driver_sharded_vsl(tmp_path):
    block = dict(
        rngOffset=0, numMaxIteration=1, timeLimitMs=-1.0,
        frameMode="accumulate", useJitter=False, useStat=False,
        statFilename="", numLightPaths=16, numVplLightPaths=8,
        numMaxBounces=1, radiusPercentage=0.05,
        forceVsl=True, vslRadiusPercentage=0.05,
        run={"photonSplat": False},
        combinedFilename="", weightedPhotonFilename="", weightedVplFilename="",
    )
    path = write_cornell_config(str(tmp_path), block, "photonfam",
                                res=16, name="mcvsl")
    res = run_photon_fam(load_config(path), mesh=make_mesh(8))
    img = res.images["combined"]
    assert np.isfinite(img).all() and (img >= 0).all() and img.max() > 0
