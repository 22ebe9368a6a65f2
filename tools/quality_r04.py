"""Round-4 quality protocol = round-3 protocol + box_field (48k tris) as
the 4th scene (VERDICT r3 #2: all previous quality scenes were <400 tris
and ran the dense XLA path — box_field is the first RMSE row that
exercises the production Pallas packet kernel end-to-end).

Usage (same as quality_r03):
  python tools/quality_r04.py run <scene> [variants,..]
  python tools/quality_r04.py gt <scene> <iters>
  python tools/quality_r04.py report

Artifacts under bench_artifacts/quality_r04/ (round-3 artifacts for the
three dense scenes are reused by copying — the estimators are unchanged;
rerun any scene whose numbers a round touches).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import quality_r03 as q  # noqa: E402

q.ART = "/root/repo/bench_artifacts/quality_r04"
q.SCENES = ("cornell", "glossy", "livingroom", "box_field")


def _trace_path(scene):
    """Which trace implementation the scene's size selects (the point of
    the box_field row: packet = the production Pallas kernel)."""
    from evplp_tpu.scene.config import load_config
    from evplp_tpu.trace.intersect import BRUTE_FORCE_MAX_TRIS
    job = load_config(os.path.join(q.CONFIGS, scene, f"{scene}_pt.json"))
    tris = int(job.scene.tris.v0.shape[0])
    return tris, ("dense" if tris <= BRUTE_FORCE_MAX_TRIS else "packet")


def report():
    rows = q.report()
    info = {}
    for scene in q.SCENES:
        if any(r["scene"] == scene for r in rows):
            tris, path = _trace_path(scene)
            info[scene] = {"tris": tris, "trace_path": path}
    out = {"rows": rows, "scene_trace_paths": info}
    with open(os.path.join(q.ART, "report.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(info, indent=1))
    return out


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "run":
        variants = sys.argv[3].split(",") if len(sys.argv) > 3 else q.VARIANTS
        q.run_techniques(sys.argv[2], variants)
    elif cmd == "gt":
        q.run_gt(sys.argv[2], int(sys.argv[3]))
    elif cmd == "report":
        report()
