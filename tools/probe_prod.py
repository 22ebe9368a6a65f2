"""Bisect the PRODUCTION packet3 kernel's per-grid-step cost on TPU.

probe_chain.py's production-volume replica runs at ~0.6 us/iteration, but
the real kernel measures ~590 us per 16k-ray grid step (~33 iters) — a
~30x gap.  This probe measures the real kernel:

  stats     run the stats build: actual live-iteration + drain-row counts
  skip      EVPLP_PROBE_SKIP_DRAIN=1 cost (traversal loop only)
  half      EVPLP_PROBE_HALF_SLAB=1 cost (half the slab vector work)

Run each variant in a FRESH process (module globals don't invalidate jit
caches — NOTES.md).  Usage:
  python tools/probe_prod.py [stats|time] [boxes] [rays] [reps]
with EVPLP_PROBE_* env vars for the lobotomies.
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    boxes = int(sys.argv[2]) if len(sys.argv) > 2 else 8500
    n_rays = int(sys.argv[3]) if len(sys.argv) > 3 else 1 << 20
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 5

    from tools.bench_trace import make_scene, make_variants, bench
    from evplp_tpu.trace import packet3
    from evplp_tpu.trace.packet3 import packet3_trace

    scene = make_scene(boxes)
    bvh = scene.bvh
    variants = make_variants(scene, n_rays, reps)

    if mode == "stats":
        for name in ("primary_t", "shadow_t", "bounce"):
            o, d, any_hit, tmin, tmax = variants[1][name]
            n = o.shape[0]
            out = packet3_trace(
                bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds,
                bvh.pk_prim_map, o, d,
                jnp.full((n,), tmin, jnp.float32),
                jnp.full((n,), tmax, jnp.float32),
                any_hit=any_hit, stats=True)
            st = np.asarray(out[4]).ravel()
            packets = n // (packet3.ROWS * 128)
            print(f"{name:10s} live-iters/packet {st[0]/packets:7.1f}  "
                  f"drain-rows/packet {st[1]/packets:6.1f} "
                  f"(useful {st[2]/packets:6.1f})", flush=True)
        return

    # time mode: production dispatch, honest fences, env knobs applied
    print("knobs:", {k: v for k, v in os.environ.items()
                     if k.startswith("EVPLP_PROBE")}, flush=True)

    for name in ("shadow_t", "bounce"):
        any_hit = variants[0][name][2]

        def f(o, d, tmin, tmax, any_hit=any_hit):
            n = o.shape[0]
            return packet3_trace(
                bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds,
                bvh.pk_prim_map, o, d,
                jnp.full((n,), tmin, jnp.float32),
                jnp.full((n,), tmax, jnp.float32), any_hit=any_hit)

        dt, times = bench(f, variants, name)
        steps = n_rays // (packet3.ROWS * packet3.NPACK * 128)
        print(f"{name:10s} {dt*1e3:8.2f} ms  {n_rays/dt/1e6:7.2f} Mray/s  "
              f"{dt/steps*1e6:8.1f} us/grid-step", flush=True)


if __name__ == "__main__":
    main()
