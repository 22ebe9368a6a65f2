"""Smoke test for the equal-time protocol (runtime/compare.py) — the ONE
implementation behind the QUALITY tables (tools/quality_r0N.py are thin
drivers of it)."""
import json
import os

import numpy as np

from evplp_tpu.runtime import compare
from evplp_tpu.scene.export import technique_block, write_spec_config
from evplp_tpu.scene.procedural import cornell_spec

RES = 16


def _mini_configs(root):
    """A shipped-tree-shaped mini config dir: <root>/cornell/cornell_*.json
    at 16x16 with tiny path counts so each frame is milliseconds."""
    scene_dir = os.path.join(root, "cornell")
    spec = cornell_spec()
    first = True
    for variant in ("pt", "ours"):
        tech, block = technique_block(variant, "cornell", False, 200.0)
        block["numLightPaths"] = min(block.get("numLightPaths", 128), 256)
        block["numVplLightPaths"] = min(block.get("numVplLightPaths", 8), 8)
        block["numMaxBounces"] = 2
        write_spec_config(scene_dir, "cornell", spec, tech, block,
                          f"cornell_{variant}", RES, RES, write_objs=first)
        first = False
    return root


def test_protocol_end_to_end(tmp_path):
    configs = _mini_configs(str(tmp_path / "configs"))
    art = str(tmp_path / "art")

    compare.run_gt("cornell", iters=3, art=art, configs=configs)
    gt = np.load(os.path.join(art, "cornell_gt.npz"))
    assert gt["img"].shape == (RES, RES, 3) and np.isfinite(gt["img"]).all()
    assert gt["mask"].dtype == bool and gt["mask"].any()

    compare.run_techniques("cornell", ("pt", "ours"), art=art,
                           configs=configs, budget_ms=200.0)
    rows = compare.report(("cornell",), art, variants=("pt", "ours"),
                          budget_ms=200.0)
    assert {r["variant"] for r in rows} == {"pt", "ours"}
    for r in rows:
        assert r["iters"] >= 1
        assert np.isfinite(r["mse"]) and np.isfinite(r["rel_mse"])
        json.dumps(r)  # rows are JSON-serializable
