"""Single-compile probe for the SORT_DQ direction-quantized sort key:
times the production sorted bounce closest (intersect_closest
sort_rays=True) on fresh bounce-distribution inputs.  Run once per
EVPLP_SORT_DQ value in FRESH processes (the key shape is baked at
import), sandwich the control.

Usage: EVPLP_SORT_DQ=N python tools/probe_dq.py [boxes] [rays] [reps]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/evplp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import bench_trace as bt  # noqa: E402


def main():
    boxes = int(sys.argv[1]) if len(sys.argv) > 1 else 8500
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    print(f"EVPLP_SORT_DQ={os.environ.get('EVPLP_SORT_DQ', '0')}",
          flush=True)
    scene = bt.make_scene(boxes)
    variants = bt.make_variants(scene, n_rays, reps)
    from evplp_tpu.trace.intersect import intersect_closest

    def f(o, d, tmin, tmax):
        n = o.shape[0]
        hit = intersect_closest(scene.tris, scene.bvh, o, d,
                                t_min=jnp.full((n,), tmin, jnp.float32),
                                t_max=jnp.full((n,), tmax, jnp.float32),
                                sort_rays=True)
        return hit.t, hit.prim, hit.u, hit.v

    dt, times = bt.bench(f, variants, "bounce")
    spread = (max(times) - min(times)) / dt * 100
    print(f"sorted bounce closest: {dt*1e3:8.2f} ms  "
          f"{n_rays/dt/1e6:6.2f} Mray/s (spread {spread:.0f}%)", flush=True)


if __name__ == "__main__":
    main()
