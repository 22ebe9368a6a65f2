"""Equal-protocol benchmark (BASELINE.md / SURVEY.md §6).

Headline metric: traced rays per second on the EVPLP ("ours") workload —
G-buffer primary rays + light-path rays + pixel x VPL shadow segments — at
reference-scale parameters (numVplLightPaths=30, numMaxBounces=3) on a
>=100k-triangle scene (box_field; the reference's conference is this scale
and its OBJs are git-LFS stubs).  Secondary: the same frame on the
62-triangle Cornell (round-1 headline), path-tracing throughput, and an
on-device differential check of the compiled Pallas kernel vs the dense
brute-force oracle.

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
import numpy as np

from evplp_tpu.core.sampling import iteration_key
from evplp_tpu.integrators.photon_fam import (
    PhotonFamConfig, init_state, photon_fam_frame)
from evplp_tpu.scene.procedural import box_field, cornell_box

# reference-protocol parameters (scene/*/*_ours.json; paths scaled to the
# procedural scenes, bounces identical)
RES = 1024
NUM_LIGHT_PATHS = 100_000
NUM_VPL_PATHS = 30
NUM_BOUNCES = 3
BIG_SCENE_BOXES = 8500          # ~102k triangles
BASELINE_MRAYS = 100.0          # north-star target, Mrays/s/chip


def evplp_rate(scene, frames_budget_s=30.0, max_frames=10):
    """Mray/s of the EVPLP frame on `scene` at reference parameters."""
    records = NUM_BOUNCES + 1
    cfg = PhotonFamConfig(
        width=RES, height=RES,
        num_light_paths=NUM_LIGHT_PATHS,
        num_vpl_light_paths=NUM_VPL_PATHS,
        num_records=records, mis_mode=1, accumulate=True, use_jitter=True,
        splat_tile=16, splat_cap=1 << 20, splat_span=2,
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

    def real_sync(st):
        # the axon tunnel's block_until_ready can return before device work
        # completes; a host FETCH of a dependent scalar cannot
        np.asarray(jax.device_get(st.dropped))

    state = frame(state, 0)                      # compile
    real_sync(state)
    t0 = time.perf_counter()
    state = frame(state, 1)
    real_sync(state)
    per_frame = time.perf_counter() - t0
    frames = max(1, min(max_frames, int(frames_budget_s / max(per_frame, 1e-3))))

    t0 = time.perf_counter()
    for i in range(frames):
        state = frame(state, 2 + i)
    real_sync(state)
    elapsed = time.perf_counter() - t0

    n_px = RES * RES
    rays_per_frame = (
        n_px                                        # primary
        + NUM_LIGHT_PATHS * (records - 1)           # light-path bounces
        + n_px * NUM_VPL_PATHS * records            # VPL shadow segments
    )
    mrays = rays_per_frame * frames / elapsed / 1e6
    return mrays, elapsed / frames * 1000.0, frames, int(state.dropped)


def kernel_check(scene, n_rays=8192):
    """Differential check of the COMPILED packet kernel (as Mosaic builds it
    on this device) vs the dense brute-force oracle."""
    from evplp_tpu.trace.intersect import (_closest_brute_chunked,
                                           intersect_closest)
    o, d = scene.camera.generate_rays(96, 96)   # 9216 coherent rays
    o, d = o[:n_rays], d[:n_rays]
    tmin = jnp.full((n_rays,), 1e-4, jnp.float32)
    tmax = jnp.full((n_rays,), 3.0e38, jnp.float32)

    hit = intersect_closest(scene.tris, scene.bvh, o, d, t_min=1e-4)
    t_ref, p_ref, _, _ = jax.jit(_closest_brute_chunked)(
        scene.tris, o, d, tmin, tmax)

    p_k = np.asarray(hit.prim)
    p_r = np.asarray(p_ref)
    hit_match = (p_k >= 0) == (p_r >= 0)
    m = (p_k >= 0) & (p_r >= 0)
    t_match = np.allclose(np.asarray(hit.t)[m], np.asarray(t_ref)[m],
                          rtol=1e-4)
    # differing prim ids with equal t are legitimate (coplanar duplicates)
    prim_match = (p_k[m] == p_r[m]) | np.isclose(
        np.asarray(hit.t)[m], np.asarray(t_ref)[m], rtol=1e-4)
    ok = bool(hit_match.all() and t_match and prim_match.all())
    return "pass" if ok else "fail"


def main():
    big = box_field(num_boxes=BIG_SCENE_BOXES)
    # slot-ordered scenes pad triangles to the packet layout; report the
    # REAL triangle count (padding rows are degenerate and never hit)
    n_tris = int((big.bvh.pk_prim_map >= 0).sum()) \
        if big.bvh.slot_order else int(big.tris.v0.shape[0])
    check = kernel_check(big)

    mrays_big, ms_big, frames_big, dropped_big = evplp_rate(big)

    small = cornell_box()
    mrays_small, ms_small, frames_small, dropped_small = evplp_rate(small)

    # path-tracing throughput on the big scene (1 primary + per-bounce
    # extension + NEE shadow segment per pixel — upper-bound ray count)
    from evplp_tpu.integrators.gbuffer import trace_gbuffer
    from evplp_tpu.integrators.pt import render_pt_frame

    @jax.jit
    def pt_frame(acc, key):
        gbuf = trace_gbuffer(big, RES, RES, None)
        return acc + render_pt_frame(big, gbuf, key, NUM_BOUNCES,
                                     tile_shape=(RES, RES))

    n_px = RES * RES
    acc = jnp.zeros((n_px, 3), jnp.float32)
    acc = pt_frame(acc, iteration_key(1, 0))
    np.asarray(jax.device_get(acc[0]))
    t0 = time.perf_counter()
    pt_frames = 10
    for i in range(pt_frames):
        acc = pt_frame(acc, iteration_key(1, 1 + i))
    np.asarray(jax.device_get(acc[0]))          # real completion fence
    pt_elapsed = time.perf_counter() - t0
    pt_rays = n_px * (1 + NUM_BOUNCES * 2)
    pt_mrays = pt_rays * pt_frames / pt_elapsed / 1e6

    print(json.dumps({
        "metric": "evplp_100k_mrays_per_sec",
        "value": round(mrays_big, 2),
        "unit": "Mray/s",
        "vs_baseline": round(mrays_big / BASELINE_MRAYS, 3),
        "scene_tris": n_tris,
        "frames": frames_big,
        "ms_per_frame": round(ms_big, 1),
        "resolution": RES,
        "device": str(jax.devices()[0]),
        "kernel_check": check,
        "dropped_splat_pairs": dropped_big,
        "cornell_mrays_per_sec": round(mrays_small, 2),
        "cornell_ms_per_frame": round(ms_small, 1),
        "pt_mrays_per_sec": round(pt_mrays, 2),
        "pt_ms_per_frame": round(pt_elapsed / pt_frames * 1000.0, 1),
    }))


if __name__ == "__main__":
    main()
