"""Body-size theory probe: time packet3 with the drain body stubbed out
(_PROBE_SKIP_DRAIN) and with half-rows slabs (_PROBE_HALF_SLAB).

Results are WRONG (no triangle tests) — timing-only archaeology.  If
skip-drain cuts shadow ~5x, per-iteration cost tracks the STATIC
instruction count of the while body and the fix is hoisting drain code
into an outer loop.

Usage: python tools/bench_skipdrain.py [boxes] [rays] [reps]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tools.bench_trace import make_scene, make_variants     # noqa: E402
import evplp_tpu.trace.packet3 as p3                        # noqa: E402


def main():
    boxes = int(sys.argv[1]) if len(sys.argv) > 1 else 8500
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    scene = make_scene(boxes)
    variants = make_variants(scene, n_rays, reps)
    bvh = scene.bvh
    pm = None if bvh.slot_order else bvh.pk_prim_map

    for skip, half in ((False, False), (True, False), (False, True),
                       (True, True)):
        p3._PROBE_SKIP_DRAIN = skip
        p3._PROBE_HALF_SLAB = half
        print(f"--- skip_drain={skip} half_slab={half}", flush=True)
        for name in ("primary_t", "shadow_t", "bounce"):
            any_hit = variants[0][name][2]

            def f(o, d, tmin, tmax, any_hit=any_hit, tag=(skip, half)):
                n = o.shape[0]
                # tag in a donated dummy arg busts jit's python-level cache
                return p3.packet3_trace(
                    bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds, pm,
                    o, d, jnp.full((n,), tmin, jnp.float32),
                    jnp.full((n,), tmax, jnp.float32),
                    any_hit=any_hit, rpl=bvh.rpl,
                    stats=(tag[0] or tag[1]) and False)

            # probes flip module globals -> must clear the jit cache
            p3.packet3_trace.clear_cache()
            o, d, _, tmin, tmax = variants[0][name]
            jax.block_until_ready(f(o, d, tmin, tmax))
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
