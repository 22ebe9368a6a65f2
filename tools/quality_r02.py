"""Round-2 quality protocol: the reference's own equal-time comparison
(BASELINE.md) run for real — 1280x720, numLightPaths=300000,
numVplLightPaths=30, numMaxBounces=3, timeLimitMs=15000 — against a cached
high-iteration PT ground truth.

Usage:
  python tools/quality_r02.py run <scene>            # all technique variants
  python tools/quality_r02.py gt <scene> <iters>     # ground truth PT
  python tools/quality_r02.py report                 # QUALITY table (stdout)

Scenes: cornell | glossy (shipped configs/ tree). Artifacts under
bench_artifacts/quality_r02/.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/evplp_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ART = "/root/repo/bench_artifacts/quality_r02"
CONFIGS = "/root/repo/configs"
VARIANTS = ("pt", "pm", "vpl", "vsl", "ours", "ours_progressive")


def _load(scene, variant):
    from evplp_tpu.scene.config import load_config
    return load_config(os.path.join(CONFIGS, scene,
                                    f"{scene}_{variant}.json"))


def run_techniques(scene):
    from evplp_tpu.runtime.loop import run_photon_fam, run_pt
    os.makedirs(ART, exist_ok=True)
    for variant in VARIANTS:
        job = _load(scene, variant)
        p = job.params
        # silence file outputs; keep the 15 s equal-time budget
        p.combined_filename = p.weighted_photon_filename = ""
        p.weighted_vpl_filename = p.output_filename = ""
        p.stat_filename = ""

        runner = run_pt if p.technique == "pt" else run_photon_fam

        # warm the jits OUTSIDE the budget (the reference compiles its
        # OptiX/GLSL programs in setup(), before its timer starts)
        p.num_max_iteration, p.time_limit_ms = 1, -1.0
        runner(job)
        p.num_max_iteration, p.time_limit_ms = -1, 15000.0

        t0 = time.time()
        result = runner(job)
        key = "output" if p.technique == "pt" else "combined"
        np.savez_compressed(
            os.path.join(ART, f"{scene}_{variant}.npz"),
            img=result.images[key].astype(np.float32),
            iters=result.num_iterations, time_ms=result.time_ms)
        print(f"{scene}_{variant}: {result.num_iterations} iters in "
              f"{result.time_ms:.0f} ms (wall {time.time()-t0:.0f}s) "
              f"{result.stats}", flush=True)


def run_gt(scene, iters):
    from evplp_tpu.integrators.gbuffer import light_image, trace_gbuffer
    from evplp_tpu.runtime.loop import run_pt
    os.makedirs(ART, exist_ok=True)
    job = _load(scene, "pt")
    p = job.params
    p.output_filename = p.stat_filename = ""
    p.num_max_iteration, p.time_limit_ms = iters, -1.0
    t0 = time.time()
    result = run_pt(job)

    # emitter mask, the reference's error-metric convention
    # (scene/conference/README.md: exclude directly visible light source —
    # "no AA on lightsource", so edge pixels are poisoned too: dilate)
    gbuf = trace_gbuffer(job.scene, job.width, job.height, None)
    li = np.asarray(light_image(job.scene, gbuf))
    lit = (li.sum(axis=-1) > 0.0).reshape(job.height, job.width)
    for _ in range(2):
        d = lit.copy()
        d[1:, :] |= lit[:-1, :]
        d[:-1, :] |= lit[1:, :]
        d[:, 1:] |= lit[:, :-1]
        d[:, :-1] |= lit[:, 1:]
        lit = d
    mask = ~lit

    np.savez_compressed(os.path.join(ART, f"{scene}_gt.npz"),
                        img=result.images["output"].astype(np.float32),
                        mask=mask,
                        iters=result.num_iterations)
    print(f"{scene}_gt: {result.num_iterations} iters in "
          f"{time.time()-t0:.0f}s wall", flush=True)


def report():
    from evplp_tpu.utils.image import mse, rel_mse
    rows = []
    for scene in ("cornell", "glossy", "box_field"):
        gt_path = os.path.join(ART, f"{scene}_gt.npz")
        if not os.path.exists(gt_path):
            continue
        gt = np.load(gt_path)
        ref = gt["img"]
        m = gt["mask"][..., None] if "mask" in gt else np.ones_like(ref[..., :1])
        for variant in VARIANTS:
            path = os.path.join(ART, f"{scene}_{variant}.npz")
            if not os.path.exists(path):
                continue
            z = np.load(path)
            rows.append({
                "scene": scene, "variant": variant,
                "iters": int(z["iters"]), "time_ms": float(z["time_ms"]),
                "mse": mse(z["img"] * m, ref * m),
                "rel_mse": rel_mse(z["img"] * m, ref * m),
                "gt_iters": int(gt["iters"]),
            })
    print(json.dumps(rows, indent=1))
    return rows


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "run":
        run_techniques(sys.argv[2])
    elif cmd == "gt":
        run_gt(sys.argv[2], int(sys.argv[3]))
    elif cmd == "report":
        report()
