"""Substantiate the packed16 capacity tier past the streamed ceiling
(VERDICT r3 #5): build a >=6M-triangle box_field, report build time,
shadow/primary kernel rates, a full EVPLP frame, and a differential
kernel check at that scale.

The only packet path at this size is packed16 node rows + HBM-streamed
tri rows (STREAM_CAP 3.2M < padded slots).  The differential check
compares 512 rays against the vmapped threaded-BVH traversal on CPU
(the packet alternatives don't compile at this scale by design).

Usage: python tools/bench_capacity6.py [boxes] [check_rays]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/tmp/evplp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    boxes = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    check_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    from evplp_tpu.scene.procedural import box_field

    t0 = time.perf_counter()
    scene = box_field(num_boxes=boxes,
                      room_scale=float(np.sqrt(boxes / 8500.0)))
    build_s = time.perf_counter() - t0
    bvh = scene.bvh
    tris = int((bvh.pk_prim_map >= 0).sum()) if bvh.slot_order \
        else int(scene.tris.v0.shape[0])
    print(f"scene: {tris} real tris, {scene.tris.v0.shape[0]} slots, "
          f"{bvh.pk_meta.shape[0]} nodes, packed16={bvh.packed16}, "
          f"build {build_s:.1f} s", flush=True)

    # ---- kernel rates (fresh inputs per rep, fetch-fenced) ----
    sys.path.insert(0, "/root/repo/tools")
    import bench_trace as bt
    n_rays = 1 << 20
    variants = bt.make_variants(scene, n_rays, 3)
    from evplp_tpu.trace.intersect import _stream_tris
    from evplp_tpu.trace.packet3 import packet3_trace
    stream = _stream_tris(scene.tris, bvh)
    print(f"stream_tris={stream}", flush=True)

    rates = {}
    for name in ("shadow_t", "primary_t"):
        any_hit = variants[0][name][2]

        def f(o, d, tmin, tmax, any_hit=any_hit):
            n = o.shape[0]
            return packet3_trace(
                bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds,
                None if bvh.slot_order else bvh.pk_prim_map,
                o, d, jnp.full((n,), tmin, jnp.float32),
                jnp.full((n,), tmax, jnp.float32), any_hit=any_hit,
                rpl=bvh.rpl, fused=bvh.fused_nodes, packed16=bvh.packed16,
                stream_tris=stream)

        dt, _ = bt.bench(f, variants, name)
        rates[name] = n_rays / dt / 1e6
        print(f"  {name}: {dt*1e3:.2f} ms = {rates[name]:.2f} Mray/s",
              flush=True)

    # ---- differential check vs the threaded-BVH walk on CPU ----
    o, d, any_hit, tmin, tmax = variants[0]["shadow_t"]
    o, d = o[:check_rays], d[:check_rays]
    tpu_prim = None
    t, prim, u, v = packet3_trace(
        bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds,
        None if bvh.slot_order else bvh.pk_prim_map,
        o, d, jnp.full((check_rays,), tmin, jnp.float32),
        jnp.full((check_rays,), tmax, jnp.float32), any_hit=True,
        rpl=bvh.rpl, fused=bvh.fused_nodes, packed16=bvh.packed16,
        stream_tris=stream)
    tpu_occ = np.asarray(prim >= 0)

    from evplp_tpu.trace.intersect import _traverse_one
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        tris_c = jax.device_put(scene.tris, cpu)
        bvh_c = jax.device_put(bvh, cpu)
        f = jax.vmap(lambda oo, dd: _traverse_one(
            tris_c, bvh_c, oo, dd, jnp.float32(tmin), jnp.float32(tmax),
            True, 14 * bvh.rpl))
        _, prim_ref, _, _ = f(jax.device_put(o, cpu), jax.device_put(d, cpu))
    ref_occ = np.asarray(prim_ref >= 0)
    agree = float((tpu_occ == ref_occ).mean())
    print(f"kernel check vs CPU threaded walk: agree {agree:.4f} "
          f"({check_rays} rays)", flush=True)

    # ---- full EVPLP frame ----
    from bench import evplp_rate
    mr, ms, frames, dropped = evplp_rate(scene, frames_budget_s=30.0,
                                         max_frames=2)
    print(f"EVPLP frame: {ms:.1f} ms, {mr:.2f} Mray/s upper-bound, "
          f"dropped={dropped}", flush=True)
    print({"capacity_6m_scene_tris": tris,
           "capacity_6m_build_s": round(build_s, 1),
           "capacity_6m_shadow_mrays": round(rates['shadow_t'], 2),
           "capacity_6m_primary_mrays": round(rates['primary_t'], 2),
           "capacity_6m_mrays_per_sec": round(mr, 2),
           "capacity_6m_ms_per_frame": round(ms, 1),
           "capacity_6m_check_agree": agree}, flush=True)


if __name__ == "__main__":
    main()
