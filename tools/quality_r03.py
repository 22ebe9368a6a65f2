"""Round-3 quality protocol — the reference's equal-time comparison
(BASELINE.md: 1280x720, 300k light paths, 30 VPL paths, 3 bounces,
timeLimitMs=15000) on THREE scenes (cornell, glossy, textured livingroom)
with the round-3 fixes:

  * BudgetPacer harness: every technique's wall clock lands within ~a
    frame of the 15 s budget (round 2 let slow techniques overshoot 1.5x),
  * VSL rows are genuine equal-time runs (difficulty-sorted sampling),
  * RelMSE uses a masked MEAN (round 2's multiply-by-mask diluted the
    denominator with 0/0.001 terms over all pixels).

Usage:
  python tools/quality_r03.py run <scene> [variants,..] # 15 s runs
  python tools/quality_r03.py gt <scene> <iters>        # PT ground truth
  python tools/quality_r03.py report                    # table (stdout)

Artifacts under bench_artifacts/quality_r03/.
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

ART = "/root/repo/bench_artifacts/quality_r03"
CONFIGS = "/root/repo/configs"
SCENES = ("cornell", "glossy", "livingroom")
VARIANTS = ("pt", "pm", "vpl", "vsl", "ours", "ours_progressive")


def _load(scene, variant):
    from evplp_tpu.scene.config import load_config
    return load_config(os.path.join(CONFIGS, scene,
                                    f"{scene}_{variant}.json"))


def run_techniques(scene, variants=VARIANTS):
    from evplp_tpu.runtime.loop import run_photon_fam, run_pt
    os.makedirs(ART, exist_ok=True)
    for variant in variants:
        job = _load(scene, variant)
        p = job.params
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
    # (scene/conference/README.md: exclude the directly visible light —
    # "no AA on lightsource"; jitter-AA'd edge pixels are poisoned: dilate)
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
                        mask=mask, iters=result.num_iterations)
    print(f"{scene}_gt: {result.num_iterations} iters in "
          f"{time.time()-t0:.0f}s wall", flush=True)


def masked_mse(img, ref, mask):
    """Mean over MASKED pixels of ||rgb diff||^2 (floatimage.cpp:64-84
    restricted to the mask, the conference-README convention)."""
    d = ((img - ref) ** 2).sum(axis=-1)
    return float(d[mask].mean())


def masked_rel_mse(img, ref, mask):
    """Masked mean of ||diff||^2 / (||ref||^2 + 0.001)
    (floatimage.cpp:86-111 with the mask as pixel subset, not a
    multiplier — round 2 multiplied, diluting the mean with ~0 terms)."""
    d = ((img - ref) ** 2).sum(axis=-1)
    den = (ref ** 2).sum(axis=-1) + 1e-3
    return float((d / den)[mask].mean())


def report():
    rows = []
    for scene in SCENES:
        gt_path = os.path.join(ART, f"{scene}_gt.npz")
        if not os.path.exists(gt_path):
            continue
        gt = np.load(gt_path)
        ref = gt["img"]
        mask = gt["mask"]
        for variant in VARIANTS:
            path = os.path.join(ART, f"{scene}_{variant}.npz")
            if not os.path.exists(path):
                continue
            z = np.load(path)
            t_ms = float(z["time_ms"])
            rows.append({
                "scene": scene, "variant": variant,
                "iters": int(z["iters"]), "time_ms": t_ms,
                "budget_dev_pct": round((t_ms - 15000.0) / 150.0, 1),
                "mse": masked_mse(z["img"], ref, mask),
                "rel_mse": masked_rel_mse(z["img"], ref, mask),
                "gt_iters": int(gt["iters"]),
            })
    print(json.dumps(rows, indent=1))
    return rows


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "run":
        variants = sys.argv[3].split(",") if len(sys.argv) > 3 else VARIANTS
        run_techniques(sys.argv[2], variants)
    elif cmd == "gt":
        run_gt(sys.argv[2], int(sys.argv[3]))
    elif cmd == "report":
        report()
