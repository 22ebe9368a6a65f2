"""Round-4 quality protocol driver — THIN wrapper over the one protocol
implementation (evplp_tpu/runtime/compare.py: production-loop pacing,
dilated emitter mask, masked metrics).  This script only pins the round's
artifact dir + scene list and annotates each scene's trace path.

Usage:
  python tools/quality_r04.py run <scene> [variants,..]
  python tools/quality_r04.py gt <scene> <iters>
  python tools/quality_r04.py report
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

from evplp_tpu.runtime import compare as q  # noqa: E402

ART = "/root/repo/bench_artifacts/quality_r04"
SCENES = ("cornell", "glossy", "livingroom", "box_field")


def _trace_path(scene):
    """Which trace implementation the scene's size selects (the point of
    the box_field row: packet = the production Pallas kernel)."""
    from evplp_tpu.trace.intersect import BRUTE_FORCE_MAX_TRIS
    job = q.load_variant(scene, "pt")
    tris = int(job.scene.tris.v0.shape[0])
    return tris, ("dense" if tris <= BRUTE_FORCE_MAX_TRIS else "packet")


def report():
    rows = q.report(SCENES, ART)
    info = {}
    for scene in SCENES:
        if any(r["scene"] == scene for r in rows):
            tris, path = _trace_path(scene)
            info[scene] = {"tris": tris, "trace_path": path}
    out = {"rows": rows, "scene_trace_paths": info}
    with open(os.path.join(ART, "report.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(info, indent=1))
    return out


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "run":
        variants = (tuple(sys.argv[3].split(","))
                    if len(sys.argv) > 3 else q.VARIANTS)
        q.run_techniques(sys.argv[2], variants, ART)
    elif cmd == "gt":
        q.run_gt(sys.argv[2], int(sys.argv[3]), ART)
    elif cmd == "report":
        report()
