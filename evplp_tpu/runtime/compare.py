"""Equal-time technique comparison — the reference's benchmark protocol
(SURVEY.md §6 / BASELINE.md): run each technique for the same wall-clock
budget, compare MSE / RelMSE against a converged path-traced reference,
optionally masking emitter pixels (scene/conference/README.md).

Usage:
    python -m evplp_tpu.runtime.compare [--scene cornell|boxfield]
        [--res 256] [--time-ms 15000] [--ref-iterations 2048]
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from evplp_tpu.core.sampling import iteration_key
from evplp_tpu.integrators.gbuffer import light_image, trace_gbuffer
from evplp_tpu.integrators.photon_fam import (
    PhotonFamConfig, init_state, photon_fam_frame)
from evplp_tpu.integrators.pt import render_pt_frame
from evplp_tpu.runtime import film
from evplp_tpu.utils import image as im


def converged_pt(scene, res: int, iterations: int, num_bounces: int = 3):
    """Accumulated jittered PT as the ground-truth image (+ emitter mask)."""
    import time
    n = res * res

    @jax.jit
    def frame(acc, key):
        u = jax.random.uniform(jax.random.fold_in(key, 999), (2,))
        jitter = (2.0 * u - 1.0) / jnp.asarray([res, res], jnp.float32)
        gbuf = trace_gbuffer(scene, res, res, jitter)
        r = render_pt_frame(scene, gbuf, key, num_bounces)
        return acc + r, light_image(scene, gbuf)

    acc = jnp.zeros((n, 3), jnp.float32)
    light = None
    t0 = time.perf_counter()
    for i in range(iterations):
        acc, light = frame(acc, iteration_key(0, i))
    jax.block_until_ready(acc)
    out = film.composite(acc, jnp.zeros_like(acc), light,
                         vpl_scale=1.0 / iterations, photon_scale=0.0)
    mask = np.asarray(light[:, 0] <= 0.0).reshape(res, res).astype(np.float64)
    return (film.to_image(out, res, res), mask,
            (time.perf_counter() - t0) * 1000.0)


def run_technique(scene, res: int, time_ms: float, name: str,
                  num_light_paths: int, num_vpl: int, mis_mode: int,
                  radius_pct: float, progressive: bool = False,
                  num_bounces: int = 3, do_photon: bool = True,
                  force_vsl: bool = False, vsl_pct: float = 0.05):
    """Equal-time run of one photon-family variant; returns final image."""
    import time
    from evplp_tpu.runtime.loop import ProgressiveSchedule

    cfg = PhotonFamConfig(
        width=res, height=res, num_light_paths=num_light_paths,
        num_vpl_light_paths=num_vpl, num_records=num_bounces + 1,
        mis_mode=mis_mode, accumulate=True, use_jitter=True,
        do_photon=do_photon, force_vsl=force_vsl,
        splat_tile=8, splat_cap=192, splat_span=2,
    )
    radius0 = max(scene.bounding_radius * radius_pct, 1e-6)
    vsl0 = max(scene.bounding_radius * vsl_pct, 0.008) if force_vsl else 0.0
    sched = ProgressiveSchedule(radius0, 1.0 / scene.total_area, 0.7,
                                num_vpl, num_light_paths, vsl0)
    # warm-up frame: JIT compile is the analogue of the reference's setup()
    # PTX compile, which its timeLimitMs clock also excludes
    warm = photon_fam_frame(
        scene, cfg, init_state(cfg), iteration_key(0, 0),
        jnp.float32(sched.radius), jnp.float32(sched.clamp),
        jnp.float32(sched.pdf_mc), jnp.float32(sched.vsl_radius))
    jax.block_until_ready(warm.vpl_acc)

    state = init_state(cfg)
    iters = 0
    t0 = time.perf_counter()
    while True:
        state = photon_fam_frame(
            scene, cfg, state, iteration_key(0, iters),
            jnp.float32(sched.radius), jnp.float32(sched.clamp),
            jnp.float32(sched.pdf_mc), jnp.float32(sched.vsl_radius))
        iters += 1
        if progressive:
            sched.update(iters)
        jax.block_until_ready(state.vpl_acc)
        if (time.perf_counter() - t0) * 1000.0 >= time_ms:
            break
    p = 1.0 / iters
    img = film.to_image(state.light_img + (state.vpl_acc + state.photon_acc) * p,
                        res, res)
    return img, iters


def run_pt_equal_time(scene, res: int, time_ms: float, num_bounces: int = 3):
    import time
    n = res * res

    @jax.jit
    def frame(acc, key):
        u = jax.random.uniform(jax.random.fold_in(key, 999), (2,))
        jitter = (2.0 * u - 1.0) / jnp.asarray([res, res], jnp.float32)
        gbuf = trace_gbuffer(scene, res, res, jitter)
        return acc + render_pt_frame(scene, gbuf, key, num_bounces), \
            light_image(scene, gbuf)

    warm, _ = frame(jnp.zeros((n, 3), jnp.float32), iteration_key(7, 0))
    jax.block_until_ready(warm)

    acc = jnp.zeros((n, 3), jnp.float32)
    light = None
    iters = 0
    t0 = time.perf_counter()
    while True:
        acc, light = frame(acc, iteration_key(7, iters))
        iters += 1
        jax.block_until_ready(acc)
        if (time.perf_counter() - t0) * 1000.0 >= time_ms:
            break
    out = film.composite(acc, jnp.zeros_like(acc), light,
                         vpl_scale=1.0 / iters, photon_scale=0.0)
    return film.to_image(out, res, res), iters


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="cornell",
                    choices=("cornell", "boxfield", "glossy"))
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--time-ms", type=float, default=15000.0)
    ap.add_argument("--ref-iterations", type=int, default=1024)
    ap.add_argument("--light-paths", type=int, default=100_000)
    args = ap.parse_args(argv)

    jax.config.update("jax_compilation_cache_dir", "/tmp/evplp_jax_cache")

    from evplp_tpu.scene.procedural import box_field, cornell_box, glossy_box
    scene = {"cornell": cornell_box, "boxfield": box_field,
             "glossy": glossy_box}[args.scene]()

    ref, mask, ref_ms = converged_pt(scene, args.res, args.ref_iterations)
    print(f"# reference: {args.ref_iterations} PT iterations "
          f"in {ref_ms / 1000.0:.1f}s")

    lp = args.light_paths
    techniques = {
        "ours": dict(num_light_paths=lp, num_vpl=30, mis_mode=1,
                     radius_pct=0.003),
        "ours_clamped": dict(num_light_paths=lp, num_vpl=30, mis_mode=4,
                             radius_pct=0.003),
        "ours_progressive": dict(num_light_paths=lp, num_vpl=30, mis_mode=1,
                                 radius_pct=0.003, progressive=True),
        "pm": dict(num_light_paths=lp, num_vpl=0, mis_mode=0,
                   radius_pct=0.003),
        "vpl": dict(num_light_paths=30, num_vpl=30, mis_mode=0,
                    radius_pct=0.0, do_photon=False),
        "vpl_clamped_only": dict(num_light_paths=lp, num_vpl=30, mis_mode=4,
                                 radius_pct=0.003, do_photon=False),
    }
    results = {}
    for name, kw in techniques.items():
        img, iters = run_technique(scene, args.res, args.time_ms, name, **kw)
        results[name] = {
            "iterations": iters,
            "mse": im.mse(img, ref, mask),
            "relmse": im.rel_mse(img, ref, mask),
        }
        print(json.dumps({"technique": name, **results[name]}))

    img, iters = run_pt_equal_time(scene, args.res, args.time_ms)
    results["pt"] = {"iterations": iters, "mse": im.mse(img, ref, mask),
                     "relmse": im.rel_mse(img, ref, mask)}
    print(json.dumps({"technique": "pt", **results["pt"]}))
    return results


if __name__ == "__main__":
    main()
