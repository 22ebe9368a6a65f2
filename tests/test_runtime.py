"""End-to-end runs through the reference-format config pipeline:
JSON -> OBJ/MTL loader -> technique driver -> image dumps + stat JSON."""
import json
import os

import numpy as np
import pytest

from evplp_tpu.runtime.render import render_config
from evplp_tpu.scene.config import load_config
from evplp_tpu.scene.export import write_cornell_config
from evplp_tpu.utils import image as im

RES = 32


def _block_common(out):
    return {
        "rngOffset": 0,
        "numMaxIteration": 2,
        "timeLimitMs": -1.0,
        "frameMode": "accumulate",
        "useJitter": True,
        "useStat": True,
        "statFilename": os.path.join(out, "stat.json"),
    }


def test_config_loader_matches_procedural(tmp_path):
    from evplp_tpu.scene.procedural import cornell_box
    block = dict(_block_common(str(tmp_path)), numSamplePerPixel=1,
                 numMaxBounces=3, outputFilename="")
    path = write_cornell_config(str(tmp_path), block, "pt", res=RES)
    job = load_config(path)
    ref = cornell_box()
    assert job.scene.num_triangles == ref.num_triangles
    np.testing.assert_allclose(job.scene.total_area, ref.total_area, rtol=1e-5)
    np.testing.assert_allclose(job.scene.bounding_radius, ref.bounding_radius,
                               rtol=1e-5)
    np.testing.assert_allclose(float(job.scene.light.area),
                               float(ref.light.area), rtol=1e-5)
    # same camera
    assert np.allclose(job.scene.camera.origin, ref.camera.origin)
    # glossy exponent survived the MTL *4 roundtrip
    ns = np.asarray(job.scene.tri_ns)
    assert np.isclose(ns.max(), 30.0)


def test_pt_end_to_end(tmp_path):
    out = str(tmp_path)
    block = dict(_block_common(out), numSamplePerPixel=1, numMaxBounces=2,
                 outputFilename=os.path.join(out, "pt.pfm"))
    path = write_cornell_config(out, block, "pt", res=RES)
    res = render_config(path)
    assert res.num_iterations == 2
    img = res.images["output"]
    assert img.shape == (RES, RES, 3)
    assert np.isfinite(img).all() and (img >= 0).all() and img.max() > 0
    saved = im.load(os.path.join(out, "pt.pfm"))
    np.testing.assert_allclose(saved, img, rtol=1e-6)
    with open(os.path.join(out, "stat.json")) as f:
        stat = json.load(f)
    assert stat["numIterations"] == 2


@pytest.mark.parametrize("variant", ["ours", "vpl", "pm", "progressive", "lvc"])
def test_photonfam_end_to_end(tmp_path, variant):
    out = str(tmp_path)
    block = dict(
        _block_common(out),
        numLightPaths=256, numVplLightPaths=8, numMaxBounces=2,
        radiusPercentage=0.05,
        combinedFilename=os.path.join(out, "c.pfm"),
        weightedPhotonFilename=os.path.join(out, "p.pfm"),
        weightedVplFilename=os.path.join(out, "v.pfm"),
    )
    tech = "photonfam"
    if variant == "vpl":
        block.update(numLightPaths=8, numVplLightPaths=8,
                     radiusPercentage=0.0, misMode="one",
                     run={"photonSplat": False})
    elif variant == "pm":
        block.update(numVplLightPaths=0, misMode="one")
    elif variant == "progressive":
        block.update(DoProgressive=True, AlphaProgressive=0.7,
                     misMode="geometryClamp")
    elif variant == "lvc":
        tech = "lvcphotonfam"

    path = write_cornell_config(out, block, tech, res=RES, name=variant)
    res = render_config(path)
    assert res.num_iterations == 2
    img = res.images["combined"]
    assert img.shape == (RES, RES, 3)
    assert np.isfinite(img).all() and (img >= 0).all() and img.max() > 0
    for f in ("c.pfm", "p.pfm", "v.pfm"):
        assert os.path.exists(os.path.join(out, f))
    # combined == light + vpl + photon split
    np.testing.assert_allclose(
        res.images["combined"],
        res.images["weighted_vpl"] + res.images["weighted_photon"],
        rtol=1e-5, atol=1e-7)


def test_vsl_end_to_end(tmp_path):
    out = str(tmp_path)
    block = dict(
        _block_common(out),
        numMaxIteration=1,
        numLightPaths=16, numVplLightPaths=4, numMaxBounces=2,
        radiusPercentage=0.05, forceVsl=True, vslRadiusPercentage=0.05,
        run={"photonSplat": False},
        combinedFilename="", weightedPhotonFilename="", weightedVplFilename="",
    )
    path = write_cornell_config(out, block, "photonfam", res=16, name="vsl")
    res = render_config(path)
    img = res.images["combined"]
    assert np.isfinite(img).all() and (img >= 0).all() and img.max() > 0


def test_budget_pacer_bounds_overshoot(monkeypatch):
    """The pacer must fence every frame near the budget so overshoot is
    ~one frame even for slow techniques (round-2 overshot by up to a sync
    interval: 26.2 s on a 15 s budget)."""
    import evplp_tpu.runtime.loop as loop_mod
    from evplp_tpu.runtime.loop import BudgetPacer

    clock = {"t": 0.0}
    monkeypatch.setattr(loop_mod.time, "perf_counter", lambda: clock["t"])
    monkeypatch.setattr(loop_mod, "_host_sync", lambda x: None)

    frame_s = 0.9                        # slow frames vs a 10 s budget
    pacer = BudgetPacer(10_000.0, t0=0.0)
    iters = 0
    fences = 0
    orig = loop_mod.BudgetPacer.should_stop
    while True:
        clock["t"] += frame_s
        iters += 1
        before = pacer.next_sync
        stopped = pacer.should_stop(iters, None)
        if iters >= before:
            fences += 1
        if stopped:
            break
        assert iters < 1000
    elapsed = clock["t"]
    # overshoot bounded by ~one frame
    assert elapsed <= 10.0 + frame_s + 1e-6, elapsed
    assert elapsed >= 10.0
    # far from the budget the pacer must NOT fence every frame
    assert fences < iters
