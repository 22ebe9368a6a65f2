"""Equal-time quality protocol — THE implementation (one code path).

The reference's benchmark setup (SURVEY.md §6 / BASELINE.md): every
technique runs the SAME shipped config for the same wall-clock budget
through the production loop (`runtime/loop.py` — BudgetPacer pacing, one
warm-up frame outside the clock, see QUALITY.md's protocol-deviation
note), then masked MSE / RelMSE against a converged jittered-PT ground
truth.  The error-metric convention is the reference's
(floatimage.cpp:64-111) restricted to non-emitter pixels
(scene/conference/README.md: "no AA on lightsource"), with the emitter
mask dilated 2 px so jitter-AA'd edge pixels don't poison the metric.

`tools/quality_r0N.py` are thin drivers of this module (they pick the
artifact dir + scene list); QUALITY.md tables come from here and nowhere
else.

CLI:
  python -m evplp_tpu.runtime.compare run <scene> [variants,..]
  python -m evplp_tpu.runtime.compare gt <scene> <iters>
  python -m evplp_tpu.runtime.compare report
  (--art-dir / --configs / --budget-ms before the subcommand)
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
CONFIGS = os.path.join(REPO, "configs")
VARIANTS = ("pt", "pm", "vpl", "vsl", "ours", "ours_progressive")
BUDGET_MS = 15000.0


def _setup_cache():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/evplp_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def load_variant(scene: str, variant: str, configs: str = CONFIGS):
    from evplp_tpu.scene.config import load_config
    return load_config(os.path.join(configs, scene,
                                    f"{scene}_{variant}.json"))


def run_techniques(scene: str, variants=VARIANTS, art: str = None,
                   configs: str = CONFIGS, budget_ms: float = BUDGET_MS):
    """Equal-time runs of the shipped config variants through the
    production loop; one .npz artifact per (scene, variant)."""
    from evplp_tpu.runtime.loop import run_photon_fam, run_pt
    _setup_cache()
    os.makedirs(art, exist_ok=True)
    for variant in variants:
        job = load_variant(scene, variant, configs)
        p = job.params
        p.combined_filename = p.weighted_photon_filename = ""
        p.weighted_vpl_filename = p.output_filename = ""
        p.stat_filename = ""
        runner = run_pt if p.technique == "pt" else run_photon_fam

        # warm the jits OUTSIDE the budget (the reference compiles its
        # OptiX/GLSL programs in setup(), before its timer starts)
        p.num_max_iteration, p.time_limit_ms = 1, -1.0
        runner(job)
        p.num_max_iteration, p.time_limit_ms = -1, budget_ms

        t0 = time.time()
        result = runner(job)
        key = "output" if p.technique == "pt" else "combined"
        np.savez_compressed(
            os.path.join(art, f"{scene}_{variant}.npz"),
            img=result.images[key].astype(np.float32),
            iters=result.num_iterations, time_ms=result.time_ms,
            dropped=result.stats.get("dropped_splat_pairs", 0))
        print(f"{scene}_{variant}: {result.num_iterations} iters in "
              f"{result.time_ms:.0f} ms (wall {time.time()-t0:.0f}s) "
              f"{result.stats}", flush=True)


def emitter_mask(job) -> np.ndarray:
    """True on pixels USED by the metrics: not on (or within 2 px of)
    the directly visible emitter."""
    from evplp_tpu.integrators.gbuffer import light_image, trace_gbuffer
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
    return ~lit


def run_gt(scene: str, iters: int, art: str = None,
           configs: str = CONFIGS):
    """Converged jittered-PT ground truth + the dilated emitter mask."""
    from evplp_tpu.runtime.loop import run_pt
    _setup_cache()
    os.makedirs(art, exist_ok=True)
    job = load_variant(scene, "pt", configs)
    p = job.params
    p.output_filename = p.stat_filename = ""
    p.num_max_iteration, p.time_limit_ms = iters, -1.0
    t0 = time.time()
    result = run_pt(job)
    np.savez_compressed(os.path.join(art, f"{scene}_gt.npz"),
                        img=result.images["output"].astype(np.float32),
                        mask=emitter_mask(job),
                        iters=result.num_iterations)
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
    multiplier)."""
    d = ((img - ref) ** 2).sum(axis=-1)
    den = (ref ** 2).sum(axis=-1) + 1e-3
    return float((d / den)[mask].mean())


def report(scenes, art: str, variants=VARIANTS,
           budget_ms: float = BUDGET_MS):
    rows = []
    for scene in scenes:
        gt_path = os.path.join(art, f"{scene}_gt.npz")
        if not os.path.exists(gt_path):
            continue
        gt = np.load(gt_path)
        ref, mask = gt["img"], gt["mask"]
        for variant in variants:
            path = os.path.join(art, f"{scene}_{variant}.npz")
            if not os.path.exists(path):
                continue
            z = np.load(path)
            t_ms = float(z["time_ms"])
            rows.append({
                "scene": scene, "variant": variant,
                "iters": int(z["iters"]), "time_ms": t_ms,
                "budget_dev_pct": round(
                    (t_ms - budget_ms) * 100.0 / budget_ms, 1),
                "mse": masked_mse(z["img"], ref, mask),
                "rel_mse": masked_rel_mse(z["img"], ref, mask),
                "gt_iters": int(gt["iters"]),
            })
    print(json.dumps(rows, indent=1))
    return rows


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--art-dir", default=os.path.join(
        REPO, "bench_artifacts", "quality"))
    ap.add_argument("--configs", default=CONFIGS)
    ap.add_argument("--budget-ms", type=float, default=BUDGET_MS)
    sub = ap.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("run")
    r.add_argument("scene")
    r.add_argument("variants", nargs="?", default=",".join(VARIANTS))
    g = sub.add_parser("gt")
    g.add_argument("scene")
    g.add_argument("iters", type=int)
    rep = sub.add_parser("report")
    rep.add_argument("scenes", nargs="?",
                     default="cornell,glossy,livingroom,box_field")
    a = ap.parse_args(argv)
    if a.cmd == "run":
        run_techniques(a.scene, tuple(a.variants.split(",")), a.art_dir,
                       a.configs, a.budget_ms)
    elif a.cmd == "gt":
        run_gt(a.scene, a.iters, a.art_dir, a.configs)
    else:
        report(tuple(a.scenes.split(",")), a.art_dir,
               budget_ms=a.budget_ms)


if __name__ == "__main__":
    main()
