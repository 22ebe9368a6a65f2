"""Equal-protocol benchmark (BASELINE.md / SURVEY.md §6).

Headline metric: traced rays per second on the EVPLP ("ours") workload —
G-buffer primary rays + light-path rays + pixel x VPL shadow segments —
at reference-scale parameters (numVplLightPaths=30, numMaxBounces=3) on the
procedural Cornell scene (the reference's OBJ scenes are git-LFS stubs).

North star (BASELINE.json): >= 100 Mrays/s/chip on TPU v5e.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""
from __future__ import annotations

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/evplp_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from evplp_tpu.core.sampling import iteration_key
from evplp_tpu.integrators.photon_fam import (
    PhotonFamConfig, init_state, photon_fam_frame)
from evplp_tpu.scene.procedural import cornell_box

# reference-protocol parameters (scene/*/*_ours.json; paths scaled to the
# procedural scene, bounces identical)
RES = 1024
NUM_LIGHT_PATHS = 100_000
NUM_VPL_PATHS = 30
NUM_BOUNCES = 3
BASELINE_MRAYS = 100.0  # north-star target, Mrays/s/chip


def main():
    scene = cornell_box()
    records = NUM_BOUNCES + 1
    cfg = PhotonFamConfig(
        width=RES, height=RES,
        num_light_paths=NUM_LIGHT_PATHS,
        num_vpl_light_paths=NUM_VPL_PATHS,
        num_records=records, mis_mode=1, accumulate=True, use_jitter=True,
        splat_tile=16, splat_cap=65536, splat_span=2,
    )
    radius = scene.bounding_radius * 0.003
    pdf_mc = (NUM_VPL_PATHS / NUM_LIGHT_PATHS) / float(jnp.pi) / (radius * radius)
    clamp = 1.0 / scene.total_area

    state = init_state(cfg)

    def frame(state, i):
        return photon_fam_frame(
            scene, cfg, state, iteration_key(0, i),
            jnp.float32(radius), jnp.float32(clamp), jnp.float32(pdf_mc),
            jnp.float32(0.0))

    # warmup/compile
    state = frame(state, 0)
    jax.block_until_ready(state.vpl_acc)

    # time one frame, then size the run to a sane budget
    t0 = time.perf_counter()
    state = frame(state, 1)
    jax.block_until_ready(state.vpl_acc)
    per_frame = time.perf_counter() - t0
    frames = max(1, min(10, int(30.0 / max(per_frame, 1e-3))))

    t0 = time.perf_counter()
    for i in range(frames):
        state = frame(state, 2 + i)
    jax.block_until_ready(state.vpl_acc)
    elapsed = time.perf_counter() - t0

    n_px = RES * RES
    rays_per_frame = (
        n_px                                        # primary
        + NUM_LIGHT_PATHS * (records - 1)           # light-path bounces
        + n_px * NUM_VPL_PATHS * records            # VPL shadow segments
    )
    mrays = rays_per_frame * frames / elapsed / 1e6

    # secondary: path-tracing throughput (1 primary + per-bounce extension
    # + NEE shadow segment per pixel, RR-terminated — count the upper bound)
    from evplp_tpu.integrators.gbuffer import trace_gbuffer
    from evplp_tpu.integrators.pt import render_pt_frame

    @jax.jit
    def pt_frame(acc, key):
        gbuf = trace_gbuffer(scene, RES, RES, None)
        return acc + render_pt_frame(scene, gbuf, key, NUM_BOUNCES)

    acc = jnp.zeros((n_px, 3), jnp.float32)
    acc = pt_frame(acc, iteration_key(1, 0))
    jax.block_until_ready(acc)
    t0 = time.perf_counter()
    pt_frames = 10
    for i in range(pt_frames):
        acc = pt_frame(acc, iteration_key(1, 1 + i))
    jax.block_until_ready(acc)
    pt_elapsed = time.perf_counter() - t0
    pt_rays = n_px * (1 + NUM_BOUNCES * 2)  # upper bound per frame
    pt_mrays = pt_rays * pt_frames / pt_elapsed / 1e6

    print(json.dumps({
        "metric": "evplp_mrays_per_sec",
        "value": round(mrays, 2),
        "unit": "Mray/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
        "frames": frames,
        "ms_per_frame": round(elapsed / frames * 1000.0, 1),
        "resolution": RES,
        "device": str(jax.devices()[0]),
        "dropped_splat_pairs": int(state.dropped),
        "pt_mrays_per_sec": round(pt_mrays, 2),
        "pt_ms_per_frame": round(pt_elapsed / pt_frames * 1000.0, 1),
    }))


if __name__ == "__main__":
    main()
