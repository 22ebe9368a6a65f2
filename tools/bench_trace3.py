"""packet3 sweep on TPU: rows x npack, 3 workloads, vs packet2 baseline.

Usage: python tools/bench_trace3.py [boxes] [rays] [reps]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tools.bench_trace import make_scene, workloads, bench  # noqa: E402


def main():
    boxes = int(sys.argv[1]) if len(sys.argv) > 1 else 8500
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    scene = make_scene(boxes)
    wl = workloads(scene, n_rays, jax.random.PRNGKey(0))
    from evplp_tpu.trace.packet3 import packet3_trace
    bvh = scene.bvh

    for rows, npack in ((64, 1), (64, 2), (32, 4)):
        print(f"--- rows={rows} npack={npack}", flush=True)
        for name, (o, d, any_hit, tmin, tmax) in wl.items():
            n = o.shape[0]
            args = []
            for j in range(2):
                dj = d * (1.0 + 1e-6 * j)
                args.append((bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds,
                             bvh.pk_prim_map, o, dj,
                             jnp.full((n,), tmin, jnp.float32),
                             jnp.full((n,), tmax, jnp.float32)))
            f = lambda *a: packet3_trace(*a, any_hit=any_hit, rows=rows,
                                         npack=npack)
            try:
                dt = bench(f, args, reps)
            except Exception as e:
                print(f"{name}: FAILED {type(e).__name__}: {e}"[:300],
                      flush=True)
                continue
            print(f"{name:8s} {n} rays: {dt*1e3:8.2f} ms  "
                  f"{n/dt/1e6:8.2f} Mray/s", flush=True)


if __name__ == "__main__":
    main()
