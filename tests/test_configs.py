"""The shipped configs/ tree: every config must load through the full
JSON -> OBJ/MTL -> SceneData pipeline, and every cornell variant must render
an iteration end-to-end (glossy/box_field reuse the identical code paths, so
loading them suffices for the smoke)."""
import glob
import json
import os

import numpy as np
import pytest

from evplp_tpu.runtime.render import render_job
from evplp_tpu.scene.config import load_config

CONFIGS = os.path.join(os.path.dirname(__file__), "..", "configs")
# box_field_big/ and box_field_huge/ are GENERATED on demand by
# tools/quality_r05.py (the 17/140 MB OBJs are git-ignored); exclude them
# from the committed matrix — their pipelines are exercised by the
# quality protocol itself.
GENERATED = ("box_field_big", "box_field_huge")
ALL = sorted(p for p in glob.glob(os.path.join(CONFIGS, "*", "*.json"))
             if os.path.basename(os.path.dirname(p)) not in GENERATED)


def test_matrix_complete():
    names = {os.path.basename(p) for p in ALL}
    for scene in ("cornell", "glossy", "box_field", "livingroom"):
        for v in ("pt", "pm", "vpl", "vsl", "ours"):
            assert f"{scene}_{v}.json" in names
            assert f"{scene}_{v}_progressive.json" in names
    assert len(ALL) == 40


@pytest.mark.parametrize("path", ALL, ids=[os.path.basename(p) for p in ALL])
def test_config_loads(path):
    job = load_config(path)
    assert job.width == 1280 and job.height == 720
    assert job.scene.tris.v0.shape[0] > 0
    p = job.params
    if p.technique != "pt":
        assert p.num_light_paths > 0
        assert p.time_limit_ms == 15000.0


def _shrunk(path, tmp_path):
    with open(path) as f:
        cfg = json.load(f)
    base = os.path.dirname(os.path.abspath(path))
    cfg["scene"] = [os.path.join(base, s) for s in cfg["scene"]]
    cfg["arealight"]["obj"] = os.path.join(base, cfg["arealight"]["obj"])
    cfg["resX"] = cfg["resY"] = 16
    tech = "pt" if "pt" in cfg else "photonfam"
    t = cfg[tech]
    t["numMaxIteration"] = 2
    t["timeLimitMs"] = -1.0
    for k in ("outputFilename", "statFilename", "combinedFilename",
              "weightedPhotonFilename", "weightedVplFilename"):
        t.pop(k, None)
    if tech != "pt":
        t["numLightPaths"] = max(t["numVplLightPaths"], 64)
        t["numVplLightPaths"] = min(t["numVplLightPaths"], 4)
    out = tmp_path / os.path.basename(path)
    out.write_text(json.dumps(cfg))
    return str(out)


CORNELL = [p for p in ALL if os.sep + "cornell" + os.sep in p]


@pytest.mark.parametrize("path", CORNELL,
                         ids=[os.path.basename(p) for p in CORNELL])
def test_cornell_variant_renders(path, tmp_path):
    job = load_config(_shrunk(path, tmp_path))
    result = render_job(job)
    assert result.num_iterations == 2
    img = next(iter(result.images.values()))
    assert np.isfinite(img).all() and img.shape == (16, 16, 3)


LIVINGROOM = [p for p in ALL if os.sep + "livingroom" + os.sep in p
              and "progressive" not in p]


@pytest.mark.parametrize("path", LIVINGROOM,
                         ids=[os.path.basename(p) for p in LIVINGROOM])
def test_livingroom_variant_renders(path, tmp_path):
    """The textured scene renders through every technique (exercises the
    map_Kd pool in the full config -> render pipeline)."""
    job = load_config(_shrunk(path, tmp_path))
    assert job.scene.tex_data.shape[0] == 2        # parquet + wood layers
    assert int((np.asarray(job.scene.tri_kd_layer) >= 0).sum()) >= 4
    result = render_job(job)
    assert result.num_iterations == 2
    img = next(iter(result.images.values()))
    assert np.isfinite(img).all() and img.shape == (16, 16, 3)
