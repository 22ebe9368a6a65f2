"""A/B packet kernel implementations through the production dispatch.

Benches through the PRODUCTION dispatch (evplp_tpu.trace.intersect), so the
swizzle / sort pipelines are included.  Workloads mirror the renderer:
  primary_t  — tile-swizzled camera rays (closest)
  shadow_t   — tile-swizzled VPL shadow segments (any hit)
  bounce_s   — sorted incoherent hemisphere rays (closest, sort_rays=True)
  nee_s      — sorted incoherent shadow segments (any hit, sort_rays=True)

Measurement rules per NOTES.md: fresh RNG-derived inputs per rep, per-rep
block_until_ready timing, checksums verified distinct, median reported.

Usage: python tools/bench_p6.py [boxes] [rays] [reps]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tools.bench_trace import make_scene, make_variants, checksum  # noqa: E402
import evplp_tpu.trace.intersect as intersect                      # noqa: E402


def run_impl(impl, scene, variants, n_rays):
    intersect.PACKET_IMPL = impl
    res = int(np.sqrt(n_rays))
    tris, bvh = scene.tris, scene.bvh
    out = {}

    cases = {
        "primary_t": ("primary", False, dict(tile_shape=(res, res))),
        "shadow_t": ("shadow", True, dict(tile_shape=(res, res))),
        "bounce_s": ("bounce", False, dict(sort_rays=True)),
        "nee_s": ("shadow", True, dict(sort_rays=True)),
    }
    for label, (src, any_hit, kw) in cases.items():
        def f(o, d, tmin, tmax, any_hit=any_hit, kw=kw):
            if any_hit:
                occ = intersect.intersect_any(
                    tris, bvh, o, d, t_min=tmin, t_max=tmax, **kw)
                return (jnp.zeros(occ.shape[0]), occ.astype(jnp.int32) - 1
                        + 2 * occ.astype(jnp.int32))
            h = intersect.intersect_closest(
                tris, bvh, o, d, t_min=tmin, t_max=tmax, **kw)
            return (h.t, h.prim)

        o, d, _, tmin, tmax = variants[0][src]
        warm = f(o, d, tmin, tmax)
        jax.block_until_ready(warm)
        out[label + "_ck"] = checksum(warm)

        times, sums = [], set()
        for v in variants[1:]:
            o, d, _, tmin, tmax = v[src]
            t0 = time.perf_counter()
            r = f(o, d, tmin, tmax)
            jax.block_until_ready(r)
            times.append(time.perf_counter() - t0)
            sums.add(checksum(r))
        dt = float(np.median(times))
        flag = ""
        if len(sums) < max(2, len(times) // 2):
            flag = "  CACHE SUSPECT"
        spread = (max(times) - min(times)) / dt * 100
        print(f"  {label:10s} {dt*1e3:8.2f} ms  {n_rays/dt/1e6:8.2f} Mray/s"
              f"  (spread {spread:.0f}%){flag}", flush=True)
        out[label] = dt
    return out


def main():
    boxes = int(sys.argv[1]) if len(sys.argv) > 1 else 8500
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    scene = make_scene(boxes)
    variants = make_variants(scene, n_rays, reps)

    impls = sys.argv[4].split(",") if len(sys.argv) > 4 else \
        ["packet3", "packet7"]
    results = {}
    for impl in impls:
        print(f"{impl}:", flush=True)
        results[impl] = run_impl(impl, scene, variants, n_rays)

    base = impls[0]
    for impl in impls[1:]:
        print(f"\nspeedup {impl}/{base}:")
        for k in results[base]:
            if k.endswith("_ck"):
                (n0, s0), (n1, s1) = results[base][k], results[impl][k]
                if n0 != n1 or abs(s0 - s1) > 1e-4 * max(abs(s0), 1.0):
                    print(f"  {k:12s} MISMATCH {results[base][k]} "
                          f"vs {results[impl][k]}")
                continue
            r = results[base][k] / results[impl][k]
            print(f"  {k:10s} {r:5.2f}x")


if __name__ == "__main__":
    main()
