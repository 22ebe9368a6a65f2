"""Determinism (SURVEY.md §4): fixed rngOffset + numMaxIteration must make
runs bit-identical — the reproducibility hook the reference gates behind
USE_DETERMINISTIC_RESULT — and cleareveryframe must keep only the last
frame."""
import numpy as np

from evplp_tpu.runtime.loop import run_photon_fam, run_pt
from evplp_tpu.scene.config import load_config
from evplp_tpu.scene.export import write_cornell_config

RES = 16


def _run(tmp_path, name, frame_mode="accumulate", iters=2, rng_offset=0):
    block = dict(
        rngOffset=rng_offset, numMaxIteration=iters, timeLimitMs=-1.0,
        frameMode=frame_mode, useJitter=True, useStat=False, statFilename="",
        numLightPaths=64, numVplLightPaths=8, numMaxBounces=2,
        radiusPercentage=0.05,
        combinedFilename="", weightedPhotonFilename="", weightedVplFilename="",
    )
    path = write_cornell_config(str(tmp_path), block, "photonfam",
                                res=RES, name=name)
    return run_photon_fam(load_config(path)).images["combined"]


def test_same_seed_bit_identical(tmp_path):
    a = _run(tmp_path, "d1")
    b = _run(tmp_path, "d2")
    np.testing.assert_array_equal(a, b)


def test_different_rng_offset_differs(tmp_path):
    a = _run(tmp_path, "d3", rng_offset=0)
    b = _run(tmp_path, "d4", rng_offset=1000)
    assert not np.array_equal(a, b)


def test_cleareveryframe_keeps_last_frame(tmp_path):
    # cleareveryframe with N iterations == the last frame alone: running 2
    # iterations must equal running iterations [1..2) with rngOffset shifted
    two = _run(tmp_path, "c1", frame_mode="cleareveryframe", iters=2)
    last_only = _run(tmp_path, "c2", frame_mode="cleareveryframe", iters=1,
                     rng_offset=1)
    np.testing.assert_array_equal(two, last_only)


def test_pt_deterministic(tmp_path):
    block = dict(
        rngOffset=5, numMaxIteration=2, timeLimitMs=-1.0,
        frameMode="accumulate", useJitter=True, useStat=False,
        statFilename="", numSamplePerPixel=1, numMaxBounces=2,
        outputFilename="")
    path = write_cornell_config(str(tmp_path), block, "pt", res=RES,
                                name="dpt")
    a = run_pt(load_config(path)).images["output"]
    b = run_pt(load_config(path)).images["output"]
    np.testing.assert_array_equal(a, b)
