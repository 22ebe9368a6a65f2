"""Capacity target (VERDICT #2): >=1M-triangle constant-density box_field
traces shadow packets at >=20 Mray/s and completes a full EVPLP frame.

Uses the fused-node + 32-triangle-leaf layout scenes auto-select past
280k triangles (scene.py), ceiling ~1.6M.

Usage: python tools/bench_capacity.py [boxes] [reps]
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/evplp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from tools.bench_trace import make_variants, checksum       # noqa: E402
from evplp_tpu.core.sampling import iteration_key           # noqa: E402
from evplp_tpu.integrators.photon_fam import (              # noqa: E402
    PhotonFamConfig, init_state, photon_fam_frame)
from evplp_tpu.scene.procedural import box_field            # noqa: E402
import evplp_tpu.trace.intersect as intersect               # noqa: E402


def main():
    boxes = int(sys.argv[1]) if len(sys.argv) > 1 else 85000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    t0 = time.time()
    scene = box_field(num_boxes=boxes,
                      room_scale=float(np.sqrt(boxes / 8500.0)))
    n_tris = int((scene.bvh.pk_prim_map >= 0).sum()) \
        if scene.bvh.slot_order else int(scene.tris.v0.shape[0])
    print(f"scene: {n_tris} real tris, fused={scene.bvh.fused_nodes} "
          f"rpl={scene.bvh.rpl} nodes={scene.bvh.pk_bounds.shape[0]} "
          f"build {time.time()-t0:.0f}s", flush=True)
    print(f"VMEM est: bounds {scene.bvh.pk_bounds.shape[0]*512//2**20} MB"
          f" + tris {scene.bvh.pk_tri_rows.shape[0]*512//2**20} MB",
          flush=True)
    assert intersect._use_packet(scene.tris, scene.bvh), "packet path off!"

    n_rays = 1 << 20
    variants = make_variants(scene, n_rays, reps)
    for name in ("primary_t", "shadow_t"):
        any_hit = variants[0][name][2]

        def f(o, d, tmin, tmax, any_hit=any_hit):
            if any_hit:
                occ = intersect.intersect_any(scene.tris, scene.bvh, o, d,
                                              t_min=tmin, t_max=tmax)
                return (jnp.zeros(occ.shape[0]),
                        occ.astype(jnp.int32) * 2 - 1)
            h = intersect.intersect_closest(scene.tris, scene.bvh, o, d,
                                            t_min=tmin, t_max=tmax)
            return (h.t, h.prim)

        o, d, _, tmin, tmax = variants[0][name]
        jax.block_until_ready(f(o, d, tmin, tmax))
        times, sums = [], set()
        for v in variants[1:]:
            o, d, _, tmin, tmax = v[name]
            t1 = time.perf_counter()
            r = f(o, d, tmin, tmax)
            jax.block_until_ready(r)
            times.append(time.perf_counter() - t1)
            sums.add(checksum(r))
        dt = float(np.median(times))
        print(f"  {name:10s} {dt*1e3:8.2f} ms  {n_rays/dt/1e6:7.2f} Mray/s"
              f"  ({len(sums)} distinct outputs)", flush=True)

    # full EVPLP frame at reference parameters
    RES = 1024
    cfg = PhotonFamConfig(
        width=RES, height=RES, num_light_paths=100_000,
        num_vpl_light_paths=30, num_records=4, mis_mode=1,
        accumulate=True, use_jitter=True,
        splat_tile=16, splat_cap=1 << 20, splat_span=2)
    radius = scene.bounding_radius * 0.003
    pdf_mc = (30 / 100_000) / float(np.pi) / (radius * radius)
    clamp = 1.0 / scene.total_area
    state = init_state(cfg)

    def frame(state, i):
        return photon_fam_frame(scene, cfg, state, iteration_key(0, i),
                                jnp.float32(radius), jnp.float32(clamp),
                                jnp.float32(pdf_mc), jnp.float32(0.0))

    state = frame(state, 0)
    np.asarray(jax.device_get(state.dropped))
    t1 = time.perf_counter()
    n_frames = 3
    for i in range(n_frames):
        state = frame(state, 1 + i)
    np.asarray(jax.device_get(state.dropped))
    ms = (time.perf_counter() - t1) / n_frames * 1000.0
    rays = RES * RES * (1 + 30 * 4) + 100_000 * 3
    print(f"EVPLP frame at {n_tris} tris: {ms:.0f} ms/frame "
          f"({rays*1e-6/ms*1000:.0f} Mray/s upper-bound), "
          f"dropped={int(state.dropped)}", flush=True)


if __name__ == "__main__":
    main()
