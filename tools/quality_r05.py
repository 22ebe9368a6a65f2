"""Round-5 quality protocol driver — thin wrapper over
evplp_tpu/runtime/compare.py (the ONE protocol implementation).

Adds over round 4 (VERDICT r4 #1):
  * box_field_big (~300k tris, 512x512): the 5th scene, crossing the
    `big` layout threshold (scene.py: >280k -> 42-tri leaves + FUSED
    node rows) — the first RMSE rows ever to execute the fused-meta
    production path.  Configs + OBJ (~17 MB) are generated on demand.
  * `stretch`: one EVPLP-vs-GT MSE row at 2.4M tris (STREAMED tri rows
    + packed16 auto-selection) at a handful of frames — an
    estimator-level layout bug shows up as a broken image long before
    convergence.

Usage:
  python tools/quality_r05.py ensure            # generate big-scene configs
  python tools/quality_r05.py run <scene> [variants,..]
  python tools/quality_r05.py gt <scene> <iters>
  python tools/quality_r05.py stretch [num_boxes] [gt_iters] [frames]
  python tools/quality_r05.py report
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

from evplp_tpu.runtime import compare as q  # noqa: E402

ART = "/root/repo/bench_artifacts/quality_r05"
CONFIGS = q.CONFIGS
SCENES = ("cornell", "glossy", "livingroom", "box_field", "box_field_big")


def ensure():
    """Generate configs/box_field_big/ if missing (OBJ not committed)."""
    d = os.path.join(CONFIGS, "box_field_big")
    if not os.path.exists(os.path.join(d, "box_field_big.obj")):
        from evplp_tpu.scene.export import write_box_field_big
        write_box_field_big(CONFIGS)
        print(f"generated {d}", flush=True)
    return d


def _layout(scene):
    """Which trace layout the scene's size selects (what each RMSE row
    actually executes)."""
    from evplp_tpu.trace.intersect import (BRUTE_FORCE_MAX_TRIS,
                                           _stream_tris)
    job = q.load_variant(scene, "pt")
    tris_n = int(job.scene.tris.v0.shape[0])
    if tris_n <= BRUTE_FORCE_MAX_TRIS:
        return tris_n, "dense"
    bvh = job.scene.bvh
    streamed = _stream_tris(job.scene.tris, bvh)
    tier = "packet"
    if bvh.fused_nodes:
        tier = "packet/fused"
    if streamed:
        tier += "+streamed"
    if getattr(bvh, "packed16", False):
        tier += "+packed16"
    return tris_n, tier


def report():
    rows = q.report(SCENES, ART)
    info = {}
    for scene in SCENES:
        if any(r["scene"] == scene for r in rows):
            tris, path = _layout(scene)
            info[scene] = {"tris": tris, "trace_path": path}
    stretch_path = os.path.join(ART, "stretch.json")
    out = {"rows": rows, "scene_trace_paths": info}
    if os.path.exists(stretch_path):
        out["stretch"] = json.load(open(stretch_path))
    with open(os.path.join(ART, "report.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(info, indent=1))
    return out


def stretch(num_boxes=200_000, gt_iters=120, res=256):
    """EVPLP vs PT-GT MSE at the STREAMED+packed16 tier (~3.6M tris) —
    through the PRODUCTION config -> loop path (the same parameter
    derivation every other quality row uses; a first hand-rolled cut
    mis-derived splat caps and dropped 5.5M pairs).  Equal-time ours at
    this scale is a handful of frames — a layout-correctness row (a
    packed16 decode or stream-DMA bug breaks the image long before
    convergence), not a convergence row."""
    import time

    import numpy as np

    from evplp_tpu.scene.export import write_scene_matrix
    from evplp_tpu.scene.procedural import box_field_big_spec

    scene = "box_field_huge"
    d = os.path.join(CONFIGS, scene)
    t0 = time.time()
    if not os.path.exists(os.path.join(d, f"{scene}.obj")):
        write_scene_matrix(CONFIGS, scene, box_field_big_spec(num_boxes),
                           (res, res))
        print(f"generated {d} ({time.time()-t0:.0f}s)", flush=True)

    os.makedirs(ART, exist_ok=True)
    q.run_gt(scene, gt_iters, ART)
    q.run_techniques(scene, ("ours",), ART)

    gtz = np.load(os.path.join(ART, f"{scene}_gt.npz"))
    ours = np.load(os.path.join(ART, f"{scene}_ours.npz"))
    gt, mask, img = gtz["img"], gtz["mask"], ours["img"]
    tris_n, tier = _layout(scene)
    out = {
        "tris": tris_n, "trace_path": tier, "res": res,
        "gt_iters": int(gtz["iters"]), "evplp_iters": int(ours["iters"]),
        "evplp_time_ms": float(ours["time_ms"]),
        "dropped_splat_pairs": int(ours["dropped"])
        if "dropped" in ours else None,
        "mse": q.masked_mse(img, gt, mask),
        "rel_mse": q.masked_rel_mse(img, gt, mask),
        "gt_mean": float(gt[mask].mean()),
        "evplp_mean": float(img[mask].mean()),
        "wall_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(ART, "stretch.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1), flush=True)
    return out


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "ensure":
        ensure()
    elif cmd == "run":
        ensure()
        variants = (tuple(sys.argv[3].split(","))
                    if len(sys.argv) > 3 else q.VARIANTS)
        q.run_techniques(sys.argv[2], variants, ART)
    elif cmd == "gt":
        ensure()
        q.run_gt(sys.argv[2], int(sys.argv[3]), ART)
    elif cmd == "stretch":
        a = sys.argv[2:]
        stretch(*(int(x) for x in a))
    elif cmd == "report":
        report()
