"""Leaf-size sweep post-rolled-drain: 8/16/32 tris per leaf.

Drain vector work measured ~free (packet4's unrolled 4x drains were flat),
so bigger leaves trade near-free drain work for the per-iteration cost
that every other knob failed to move.  Also quarters node VMEM (capacity).

Usage: python tools/bench_leaf.py [boxes] [rays] [reps]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tools.bench_trace import (checksum, make_scene,        # noqa: E402
                               make_variants)
from evplp_tpu.accel.bvh import build_bvh                   # noqa: E402
from evplp_tpu.trace.packet3 import packet3_trace           # noqa: E402


def main():
    boxes = int(sys.argv[1]) if len(sys.argv) > 1 else 8500
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    scene = make_scene(boxes)
    variants = make_variants(scene, n_rays, reps)
    tris = scene.tris
    v0 = np.asarray(tris.v0)
    v1 = v0 + np.asarray(tris.e1)
    v2 = v0 + np.asarray(tris.e2)
    # drop slot-padding rows (degenerate zero triangles)
    real = np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1) > 0
    v0, v1, v2 = v0[real], v1[real], v2[real]
    print(f"real tris: {v0.shape[0]}", flush=True)

    results = {}
    for leaf in (8, 16, 32, 8):
        bvh, _ = build_bvh(v0, v1, v2, leaf_size=leaf, pack=True)
        print(f"--- leaf={leaf} rpl={bvh.rpl} nodes={bvh.num_nodes} "
              f"tri_rows={bvh.pk_tri_rows.shape[0]}", flush=True)
        for name in ("primary_t", "shadow_t", "bounce"):
            any_hit = variants[0][name][2]

            def f(o, d, tmin, tmax, any_hit=any_hit, bvh=bvh):
                n = o.shape[0]
                return packet3_trace(
                    bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds,
                    bvh.pk_prim_map, o, d,
                    jnp.full((n,), tmin, jnp.float32),
                    jnp.full((n,), tmax, jnp.float32),
                    any_hit=any_hit, rpl=bvh.rpl)

            o, d, _, tmin, tmax = variants[0][name]
            warm = f(o, d, tmin, tmax)
            jax.block_until_ready(warm)
            ck = checksum(warm)
            prev = results.get(name)
            if prev is not None and (prev[0] != ck[0] or
                                     abs(prev[1] - ck[1])
                                     > 1e-3 * max(abs(ck[1]), 1)):
                print(f"  !! {name} CHECKSUM MISMATCH {prev} vs {ck}",
                      flush=True)
            results[name] = ck
            times = []
            for v in variants[1:]:
                o, d, _, tmin, tmax = v[name]
                t0 = time.perf_counter()
                r = f(o, d, tmin, tmax)
                jax.block_until_ready(r)
                times.append(time.perf_counter() - t0)
            dt = float(np.median(times))
            spread = (max(times) - min(times)) / dt * 100
            print(f"  {name:10s} {dt*1e3:8.2f} ms  {n_rays/dt/1e6:7.2f} "
                  f"Mray/s (spread {spread:.0f}%)", flush=True)


if __name__ == "__main__":
    main()
