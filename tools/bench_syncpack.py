"""A/B the packed single-scalar-readout (sync_pack) in packet3 on TPU.

Usage: python tools/bench_syncpack.py [boxes] [rays] [reps]
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
from evplp_tpu.trace.packet3 import packet3_trace           # noqa: E402


def main():
    boxes = int(sys.argv[1]) if len(sys.argv) > 1 else 8500
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    scene = make_scene(boxes)
    variants = make_variants(scene, n_rays, reps)
    bvh = scene.bvh
    pm = None if bvh.slot_order else bvh.pk_prim_map

    results = {}
    for sp in (False, True, False):
        tag = f"sync_pack={sp}"
        print(tag, flush=True)
        for name in ("primary_t", "shadow_t", "bounce"):
            any_hit = variants[0][name][2]

            def f(o, d, tmin, tmax, any_hit=any_hit, sp=sp):
                n = o.shape[0]
                return packet3_trace(
                    bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds, pm,
                    o, d, jnp.full((n,), tmin, jnp.float32),
                    jnp.full((n,), tmax, jnp.float32),
                    any_hit=any_hit, rpl=bvh.rpl, sync_pack=sp)

            o, d, _, tmin, tmax = variants[0][name]
            warm = f(o, d, tmin, tmax)
            jax.block_until_ready(warm)
            ck = checksum(warm)
            prev = results.get(("ck", name))
            if prev is not None and (prev[0] != ck[0] or
                                     abs(prev[1] - ck[1]) > 1e-3 * max(abs(ck[1]), 1)):
                print(f"  !! {name} CHECKSUM MISMATCH {prev} vs {ck}")
            results[("ck", name)] = ck
            times, sums = [], set()
            for v in variants[1:]:
                o, d, _, tmin, tmax = v[name]
                t0 = time.perf_counter()
                r = f(o, d, tmin, tmax)
                jax.block_until_ready(r)
                times.append(time.perf_counter() - t0)
                sums.add(checksum(r))
            dt = float(np.median(times))
            spread = (max(times) - min(times)) / dt * 100
            print(f"  {name:10s} {dt*1e3:8.2f} ms  {n_rays/dt/1e6:7.2f} "
                  f"Mray/s (spread {spread:.0f}%)", flush=True)


if __name__ == "__main__":
    main()
