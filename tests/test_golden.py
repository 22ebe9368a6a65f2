"""Golden-image regression: deterministic tiny renders with fixed seeds
(the reproducibility hook SURVEY.md §4 recommends standardizing on:
cleareveryframe + numMaxIteration + fixed rngOffset).

Goldens are generated on first run (CPU) and committed; subsequent runs
compare within a tolerance that absorbs cross-version float drift.
"""
import os

import numpy as np
import pytest

from evplp_tpu.runtime.loop import run_photon_fam, run_pt
from evplp_tpu.scene.config import load_config
from evplp_tpu.scene.export import write_cornell_config

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
RES = 16


def _render(tmp_path, tech, block, name):
    path = write_cornell_config(str(tmp_path), block, tech, res=RES, name=name)
    job = load_config(path)
    if tech == "pt":
        return run_pt(job).images["output"]
    return run_photon_fam(job).images["combined"]


def _check_golden(name, img):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        np.savez_compressed(path, img=img.astype(np.float32))
        pytest.skip(f"golden {name} generated; rerun to compare")
    ref = np.load(path)["img"]
    np.testing.assert_allclose(img, ref, rtol=2e-3, atol=2e-4)


COMMON = dict(rngOffset=3, numMaxIteration=2, timeLimitMs=-1.0,
              frameMode="accumulate", useJitter=True, useStat=False,
              statFilename="")


def test_golden_pt(tmp_path):
    block = dict(COMMON, numSamplePerPixel=1, numMaxBounces=2,
                 outputFilename="")
    _check_golden("pt", _render(tmp_path, "pt", block, "gpt"))


def test_golden_ours(tmp_path):
    block = dict(COMMON, numLightPaths=128, numVplLightPaths=8,
                 numMaxBounces=2, radiusPercentage=0.05,
                 combinedFilename="", weightedPhotonFilename="",
                 weightedVplFilename="")
    _check_golden("ours", _render(tmp_path, "photonfam", block, "gours"))


def test_golden_ours_clamped_progressive(tmp_path):
    block = dict(COMMON, numLightPaths=128, numVplLightPaths=8,
                 numMaxBounces=2, radiusPercentage=0.05,
                 misMode="geometryClamp", DoProgressive=True,
                 AlphaProgressive=0.7,
                 combinedFilename="", weightedPhotonFilename="",
                 weightedVplFilename="")
    _check_golden("ours_prog",
                  _render(tmp_path, "photonfam", block, "gprog"))


def test_golden_vsl(tmp_path):
    """VSL (forceVsl photonfam) golden — the most quirk-laden estimator
    (3-strategy MIS + reference pdf quirks); a silent drift here previously
    would only surface in the next full QUALITY protocol run (VERDICT r4 #7)."""
    block = dict(COMMON, numLightPaths=64, numVplLightPaths=64,
                 numMaxBounces=2, radiusPercentage=0.0,
                 forceVsl=True, vslRadiusPercentage=0.05,
                 misMode="one",
                 combinedFilename="", weightedPhotonFilename="",
                 weightedVplFilename="")
    _check_golden("vsl", _render(tmp_path, "photonfam", block, "gvsl"))


def test_golden_lvc(tmp_path):
    """LVC (lvcphotonfam) golden — per-pixel window gathers."""
    block = dict(COMMON, numLightPaths=128, numVplLightPaths=8,
                 numMaxBounces=2, radiusPercentage=0.05,
                 combinedFilename="", weightedPhotonFilename="",
                 weightedVplFilename="")
    _check_golden("lvc", _render(tmp_path, "lvcphotonfam", block, "glvc"))
