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


def stretch(num_boxes=200_000, gt_iters=120, frames=3, res=256):
    """EVPLP vs PT-GT MSE at the STREAMED(+packed16) tier: 2.4M tris,
    few frames.  Not equal-time — a layout-correctness row (a fused-meta
    decode or stream-DMA bug breaks the image long before convergence)."""
    import time

    import numpy as np

    q._setup_cache()
    import jax
    import jax.numpy as jnp

    from evplp_tpu.core.sampling import iteration_key
    from evplp_tpu.integrators.gbuffer import light_image, trace_gbuffer
    from evplp_tpu.integrators.photon_fam import (PhotonFamConfig,
                                                  init_state,
                                                  photon_fam_frame)
    from evplp_tpu.integrators.pt import render_pt_frame
    from evplp_tpu.runtime import film
    from evplp_tpu.scene.procedural import box_field_big

    os.makedirs(ART, exist_ok=True)
    t0 = time.time()
    scene = box_field_big(num_boxes)
    tris_n = int(scene.tris.v0.shape[0])
    print(f"scene: {tris_n} tris (build {time.time()-t0:.0f}s)", flush=True)

    n = res * res

    @jax.jit
    def pt_frame(acc, key):
        u = jax.random.uniform(jax.random.fold_in(key, 999), (2,))
        jitter = (2.0 * u - 1.0) / jnp.asarray([res, res], jnp.float32)
        gbuf = trace_gbuffer(scene, res, res, jitter)
        return acc + render_pt_frame(scene, gbuf, key, 3), \
            light_image(scene, gbuf)

    acc = jnp.zeros((n, 3), jnp.float32)
    light = None
    for i in range(gt_iters):
        acc, light = pt_frame(acc, iteration_key(0, i))
        if i == 0:
            jax.block_until_ready(acc)
            print(f"gt frame 0 done at {time.time()-t0:.0f}s", flush=True)
    gt = film.composite(acc, jnp.zeros_like(acc), light,
                        vpl_scale=1.0 / gt_iters, photon_scale=0.0)
    gt = np.asarray(gt).reshape(res, res, 3)
    mask = np.asarray(light[:, 0] <= 0.0).reshape(res, res)
    print(f"gt: {gt_iters} iters at {time.time()-t0:.0f}s", flush=True)

    cfg = PhotonFamConfig(
        width=res, height=res, num_light_paths=300_000,
        num_vpl_light_paths=30, num_records=4, mis_mode=1,
        accumulate=True, use_jitter=True,
        splat_tile=8, splat_cap=192, splat_span=2)
    radius = scene.bounding_radius * 0.003
    pdf_mc = (cfg.num_vpl_light_paths / cfg.num_light_paths) / \
        float(np.pi) / (radius * radius)
    state = init_state(cfg)
    for i in range(frames):
        state = photon_fam_frame(scene, cfg, state, iteration_key(0, i),
                                 jnp.float32(radius),
                                 jnp.float32(1.0 / scene.total_area),
                                 jnp.float32(pdf_mc), jnp.float32(0.0))
    jax.block_until_ready(state.vpl_acc)
    img = film.to_image(
        state.light_img + (state.vpl_acc + state.photon_acc) / frames,
        res, res)
    out = {
        "tris": tris_n, "res": res, "gt_iters": gt_iters,
        "evplp_frames": frames,
        "dropped_splat_pairs": int(state.dropped),
        "mse": q.masked_mse(img, gt, mask),
        "rel_mse": q.masked_rel_mse(img, gt, mask),
        "gt_mean": float(gt[mask].mean()),
        "evplp_mean": float(np.asarray(img)[mask].mean()),
        "wall_s": round(time.time() - t0, 1),
    }
    np.savez_compressed(os.path.join(ART, "stretch_imgs.npz"),
                        gt=gt.astype(np.float32),
                        evplp=np.asarray(img, np.float32), mask=mask)
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
