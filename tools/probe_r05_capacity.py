"""Capacity-tier decay attribution (VERDICT r4 weak #2): why does shadow
throughput fall 370 -> 64 -> 42 -> 30 -> 23.5 Mray/s across the ladder?

Per tier, on the SAME 1M-segment coherent shadow workload bench.py's
capacity rows use, this records the kernel's own counters
(packet3 stats: traversal iterations x live packets, drained tri rows
executed/useful) plus the wall time — separating "the tree is deeper /
the packet working set is wider" (iterations/ray, rows/ray grow) from
fixed-overhead suspects (sort, DMA), and quantifying the drain slack
(executed vs useful rows).

Usage: python tools/probe_r05_capacity.py [boxes ...]
(default tiers: 8500 / 24500 / 85000 / 200000 boxes)
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/evplp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from evplp_tpu.scene.procedural import box_field  # noqa: E402
from evplp_tpu.trace import packet3  # noqa: E402
from evplp_tpu.trace.intersect import (_stream_tris,  # noqa: E402
                                       intersect_any)

SIDE = 1024


def shadow_args(scene):
    lo = np.asarray(scene.bvh.node_min[0])
    hi = np.asarray(scene.bvh.node_max[0])
    gx, gz = np.meshgrid(np.linspace(0.05, 0.95, SIDE, dtype=np.float32),
                         np.linspace(0.05, 0.95, SIDE, dtype=np.float32),
                         indexing="ij")
    pts = np.stack([lo[0] + gx * (hi[0] - lo[0]),
                    np.full_like(gx, lo[1] + 0.3 * (hi[1] - lo[1])),
                    lo[2] + gz * (hi[2] - lo[2])], axis=-1).reshape(-1, 3)
    lp = np.asarray(scene.light.v0).reshape(-1, 3).mean(axis=0)
    o = jnp.asarray(np.broadcast_to(lp, pts.shape).astype(np.float32))
    return o, jnp.asarray(pts) - o


def tier(boxes: int):
    import math
    t0 = time.time()
    scene = box_field(num_boxes=boxes,
                      room_scale=max(1.0, math.sqrt(boxes / 8500.0)))
    n_tris = int(scene.tris.v0.shape[0])
    build_s = time.time() - t0
    o, d = shadow_args(scene)
    n = o.shape[0]
    bvh = scene.bvh
    stream = _stream_tris(scene.tris, bvh)

    # timed row: the production dispatch (same as bench capacity rows)
    @jax.jit
    def step(carry, i):
        off = jnp.float32(1e-6) * i + 1e-9 * carry.sum()
        occ = intersect_any(scene.tris, bvh, o + off, d,
                            t_min=1e-4, t_max=1.0 - 1e-4,
                            tile_shape=(SIDE, SIDE))
        return occ.astype(jnp.float32), i + 1.0

    c = jnp.zeros((n,), jnp.float32)
    c, i = step(c, jnp.float32(0.0))
    np.asarray(jax.device_get(c[0]))
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        c, i = step(c, i)
    np.asarray(jax.device_get(c[0]))
    ms = (time.perf_counter() - t0) / reps * 1000.0

    # counters: one stats run through the same kernel shape
    pm = None if bvh.slot_order else bvh.pk_prim_map
    _, prim, _, _, stat = packet3.packet3_trace(
        bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds, pm,
        o, d, jnp.full((n,), 1e-4, jnp.float32),
        jnp.full((n,), 1.0 - 1e-4, jnp.float32),
        any_hit=True, rpl=bvh.rpl, stats=True,
        fused=bvh.fused_nodes, stream_tris=stream,
        packed16=bvh.packed16)
    s = np.asarray(stat)
    out = {
        "boxes": boxes, "tris": n_tris, "build_s": round(build_s, 1),
        "layout": ("packed16" if bvh.packed16 else
                   "fused" if bvh.fused_nodes else "plain")
                  + ("+streamed" if stream else ""),
        "shadow_ms_per_mray": round(ms, 1),
        "mrays_per_sec": round(n / ms / 1e3, 1),
        "trav_iters_x_packets": int(s[0]),
        "drain_rows_executed": int(s[1]),
        "drain_rows_useful": int(s[2]),
        "iters_per_1k_rays": round(s[0] * 1000.0 / n, 2),
        "tri_rows_per_1k_rays": round(s[1] * 1000.0 / n, 2),
        "drain_slack_x": round(s[1] / max(s[2], 1), 2),
    }
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    tiers = [int(a) for a in sys.argv[1:]] or [8500, 24500, 85000, 200000]
    for b in tiers:
        tier(b)
