"""Does the per-packet constant amortize over BIGGER packets?

Sweeps packet3's rows (packet size) at fixed npack=1|2 on a scene that
fits VMEM, kernel-level, fresh inputs per rep, median.  If throughput
rises with rows, the ~250us/packet constant amortizes and the dense
wide-node layout (which frees the VMEM it needs) is the round-3 kernel.

Usage: python tools/bench_rows.py [boxes] [rays] [reps]
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
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    scene = make_scene(boxes)
    variants = make_variants(scene, n_rays, reps)
    bvh = scene.bvh
    pm = None if bvh.slot_order else bvh.pk_prim_map

    for rows, npack in ((64, 2), (128, 1), (128, 2), (256, 1), (256, 2),
                        (512, 1)):
        print(f"--- rows={rows} npack={npack}", flush=True)
        for name in ("primary_t", "shadow_t", "bounce"):
            any_hit = variants[0][name][2]

            def f(o, d, tmin, tmax, any_hit=any_hit, rows=rows, npack=npack):
                n = o.shape[0]
                return packet3_trace(
                    bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds, pm,
                    o, d, jnp.full((n,), tmin, jnp.float32),
                    jnp.full((n,), tmax, jnp.float32),
                    any_hit=any_hit, rows=rows, npack=npack, rpl=bvh.rpl)

            try:
                o, d, _, tmin, tmax = variants[0][name]
                jax.block_until_ready(f(o, d, tmin, tmax))
            except Exception as e:
                print(f"  {name:10s} FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
                continue
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
            flag = "  CACHE?" if len(sums) < max(2, len(times) // 2) else ""
            print(f"  {name:10s} {dt*1e3:8.2f} ms  {n_rays/dt/1e6:7.2f} "
                  f"Mray/s (spread {spread:.0f}%){flag}", flush=True)


if __name__ == "__main__":
    main()
