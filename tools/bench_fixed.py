"""Isolate the per-packet fixed cost of packet3: scale scene size and
packet count independently on the SHADOW workload (fewest iterations).

Usage: python tools/bench_fixed.py
"""
from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tools.bench_trace import make_scene, make_variants  # noqa: E402


def timed(fn, variants, name):
    o, d, any_hit, tmin, tmax = variants[0][name]
    jax.block_until_ready(fn(variants[0]))
    best = 1e9
    for v in variants[1:]:
        t0 = time.perf_counter()
        jax.block_until_ready(fn(v))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from evplp_tpu.accel.bvh import build_bvh
    from evplp_tpu.trace.packet3 import packet3_trace
    seed = int.from_bytes(os.urandom(4), "little")
    print(f"seed {seed}", flush=True)

    for boxes in (100, 1000, 8500):
        scene = make_scene(boxes)
        tris = scene.tris
        v0 = np.asarray(tris.v0)
        v1 = v0 + np.asarray(tris.e1)
        v2 = v0 + np.asarray(tris.e2)
        bvh, _ = build_bvh(v0, v1, v2, pack=True)
        for n_rays in (512 * 512, 1024 * 1024):
            variants = make_variants(scene, n_rays, 3, seed=seed + n_rays)
            name = "shadow_t"

            def fn(v, name=name):
                o, d, any_hit, tmin, tmax = v[name]
                n = o.shape[0]
                return packet3_trace(
                    bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds,
                    bvh.pk_prim_map, o, d,
                    jnp.full((n,), tmin, jnp.float32),
                    jnp.full((n,), tmax, jnp.float32), any_hit=True)

            dt = timed(fn, variants, name)
            packets = n_rays // (128 * 128)  # rows*npack*LANES = 16384
            print(f"tris {v0.shape[0]:7d} rays {n_rays:8d} "
                  f"({packets:3d} packets): {dt*1e3:7.2f} ms  "
                  f"{dt/packets*1e6:7.1f} us/packet  "
                  f"{n_rays/dt/1e6:7.1f} Mray/s", flush=True)


if __name__ == "__main__":
    main()
