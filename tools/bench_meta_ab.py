"""Same-session A/B of the packet-kernel scalar-sync fixes
(VERDICT r3 #1: SMEM meta words + vector-domain drain gathers).

Measures the production workload shapes (coherent shadow, tiled primary,
sorted bounce closest + sorted NEE any-hit) for every (smem_meta,
drain_gather) combination in ONE process, on fresh inputs per rep with
fetch fences (bench_trace harness, obeys the NOTES measurement rules).

Usage: python tools/bench_meta_ab.py [boxes] [rays] [reps]
"""
from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import bench_trace as bt  # noqa: E402


def main():
    boxes = int(sys.argv[1]) if len(sys.argv) > 1 else 8500
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    scene = bt.make_scene(boxes)
    variants = bt.make_variants(scene, n_rays, reps)
    from evplp_tpu.trace.packet3 import packet3_trace
    from evplp_tpu.trace.intersect import SORTED_ROWS, SORTED_NPACK
    bvh = scene.bvh

    def run(name, sm, dg, rows=None, npack=None):
        any_hit = variants[0][name][2]
        kw = {}
        if rows:
            kw = dict(rows=rows, npack=npack)

        def f(o, d, tmin, tmax):
            n = o.shape[0]
            return packet3_trace(
                bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds,
                None if bvh.slot_order else bvh.pk_prim_map,
                o, d, jnp.full((n,), tmin, jnp.float32),
                jnp.full((n,), tmax, jnp.float32), any_hit=any_hit,
                rpl=bvh.rpl, fused=bvh.fused_nodes,
                smem_meta=sm, drain_gather=dg, **kw)

        dt, times = bt.bench(f, variants, name)
        spread = (max(times) - min(times)) / dt * 100
        print(f"  {name:10s} sm={int(sm)} dg={int(dg)}: {dt*1e3:8.2f} ms  "
              f"{n_rays/dt/1e6:7.2f} Mray/s (spread {spread:.0f}%)",
              flush=True)
        return dt

    # sorted-shape bounce uses the production sorted packet shape
    combos = [(False, False), (False, True), (True, False), (True, True)]
    res = {}
    for name in ("shadow_t", "primary_t"):
        for sm, dg in combos:
            res[(name, sm, dg)] = run(name, sm, dg)
    for sm, dg in combos:
        res[("bounce_sorted", sm, dg)] = run(
            "bounce", sm, dg, rows=SORTED_ROWS, npack=SORTED_NPACK)

    print("\nratios vs (sm=0, dg=0) control:")
    for name in ("shadow_t", "primary_t", "bounce_sorted"):
        base = res[(name, False, False)]
        row = "  ".join(
            f"sm={int(sm)},dg={int(dg)}: {base/res[(name, sm, dg)]:.2f}x"
            for sm, dg in combos[1:])
        print(f"  {name:14s} {row}", flush=True)


if __name__ == "__main__":
    main()
