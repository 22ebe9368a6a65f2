"""Kernel-config sweep on TPU with the cache-safe harness (bench_trace.py):
packet3 (rows x npack), packet4, packet5 across the renderer's ray mixes.

Usage: python tools/bench_trace3.py [boxes] [rays] [reps]
"""
from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tools.bench_trace import bench, make_scene, make_variants  # noqa: E402

WORKLOADS = ("primary_t", "shadow_t", "bounce")


def main():
    boxes = int(sys.argv[1]) if len(sys.argv) > 1 else 8500
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    scene = make_scene(boxes)
    variants = make_variants(scene, n_rays, reps)
    bvh = scene.bvh

    from evplp_tpu.trace.packet3 import packet3_trace
    from evplp_tpu.trace.packet5 import packet5_trace

    def p3(rows, npack):
        def f(o, d, tmin, tmax, any_hit):
            n = o.shape[0]
            return packet3_trace(
                bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds, bvh.pk_prim_map,
                o, d, jnp.full((n,), tmin, jnp.float32),
                jnp.full((n,), tmax, jnp.float32),
                any_hit=any_hit, rows=rows, npack=npack)
        return f

    def p5(rows, npack):
        def f(o, d, tmin, tmax, any_hit):
            n = o.shape[0]
            return packet5_trace(
                bvh.pk_tri_rows, bvh.pk_fb, bvh.pk_fm, bvh.pk_prim_map,
                o, d, jnp.full((n,), tmin, jnp.float32),
                jnp.full((n,), tmax, jnp.float32),
                any_hit=any_hit, rows=rows, npack=npack)
        return f

    configs = [(f"p3 r{r} k{k}", p3(r, k))
               for r, k in ((64, 1), (64, 2), (64, 4), (32, 2), (32, 4),
                            (32, 8), (16, 8), (128, 2))]
    configs += [(f"p5 r{r} k{k}", p5(r, k)) for r, k in ((64, 2), (32, 4))]

    # multi-row leaves: rebuild the BVH at leaf_size 16/32 (rpl 2/4)
    from evplp_tpu.accel.bvh import build_bvh
    tris = scene.tris
    v0 = np.asarray(tris.v0)
    v1 = v0 + np.asarray(tris.e1)
    v2 = v0 + np.asarray(tris.e2)
    for ls in (16, 32):
        bvh_ls, perm = build_bvh(v0, v1, v2, leaf_size=ls, pack=True)
        # perm reorders prim ids only — irrelevant for timing
        def p3l(rows, npack, b=bvh_ls):
            def f(o, d, tmin, tmax, any_hit):
                n = o.shape[0]
                return packet3_trace(
                    b.pk_tri_rows, b.pk_meta, b.pk_bounds, b.pk_prim_map,
                    o, d, jnp.full((n,), tmin, jnp.float32),
                    jnp.full((n,), tmax, jnp.float32),
                    any_hit=any_hit, rows=rows, npack=npack, rpl=b.rpl)
            return f
        configs += [(f"p3L{ls} r{r} k{k}", p3l(r, k))
                    for r, k in ((64, 2), (32, 4))]

    for label, fk in configs:
        line = [f"{label:12s}"]
        for name in WORKLOADS:
            any_hit = variants[0][name][2]
            fn = (lambda o, d, tmin, tmax, fk=fk, ah=any_hit:
                  fk(o, d, tmin, tmax, ah))
            try:
                dt, _ = bench(fn, variants, name)
                line.append(f"{name}: {n_rays/dt/1e6:7.2f} Mray/s")
            except Exception as e:  # noqa: BLE001
                line.append(f"{name}: FAIL {type(e).__name__}")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
