"""TRUE kernel rates via chained dispatch (one RTT for K kernel calls).

Round-3 discovery: every per-dispatch micro-benchmark in this repo was
dominated by the axon tunnel's ~27-34 ms per-call RTT — an empty workload
(while loop exits after ~1 iteration) measures 34 ms with a fetch fence,
the same as a full 1M-ray shadow trace (37 ms).  The mythical
"~200-265 us/packet grid glue" was 34 ms RTT / 64 grid steps.  This bench
removes the constant:

  * K kernel calls are chained inside ONE jit (call i+1's origins depend
    on call i's output through a *1e-30 scalar, forcing sequential
    execution without changing the workload);
  * each call uses a DIFFERENT precomputed ray set (tunnel result cache);
  * timed at two K values; the slope is the true per-call kernel cost.

Usage: python tools/bench_chain.py [boxes] [rays] [reps] [workloads]
"""
from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

K_LO, K_HI = 2, 8


def make_chain(bvh, any_hit: bool, k: int, sort: bool):
    from evplp_tpu.trace.packet3 import packet3_trace
    from evplp_tpu.trace.intersect import _sorted_packet_trace

    @jax.jit
    def chain(o_all, d_all, tmin, tmax):
        s = jnp.float32(0.0)
        for i in range(k):
            o = o_all[i] + s * 1e-30    # serialize: depend on prior call
            if sort:
                t, prim, u, v = _sorted_packet_trace(
                    bvh, o, d_all[i], tmin, tmax, any_hit)
            else:
                t, prim, u, v = packet3_trace(
                    bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds,
                    bvh.pk_prim_map, o, d_all[i], tmin, tmax,
                    any_hit=any_hit)
            s = jnp.sum(jnp.nan_to_num(t, posinf=0.0)) + prim[0]
        return s

    return chain


def true_rate(bvh, name, work, reps):
    o, d, any_hit, tmin, tmax, sort = work
    n = o.shape[0] // (K_HI + reps)
    tmin = jnp.full((n,), tmin, jnp.float32)
    tmax = jnp.full((n,), tmax, jnp.float32)
    res = {}
    for k in (K_LO, K_HI):
        chain = make_chain(bvh, any_hit, k, sort)
        times = []
        for rep in range(reps + 1):
            # k DIFFERENT ray sets per link; base shifts per rep
            base = rep
            o_all = jax.lax.dynamic_slice_in_dim(o, base * n, k * n
                                                 ).reshape(k, n, 3)
            d_all = jax.lax.dynamic_slice_in_dim(d, base * n, k * n
                                                 ).reshape(k, n, 3)
            jax.block_until_ready((o_all, d_all))
            t0 = time.perf_counter()
            out = float(chain(o_all, d_all, tmin, tmax))  # fetch fence
            dt = time.perf_counter() - t0
            if rep:
                times.append(dt)
        res[k] = float(np.median(times))
    per_call = (res[K_HI] - res[K_LO]) / (K_HI - K_LO)
    fixed = res[K_LO] - per_call * K_LO
    print(f"{name:12s} {per_call*1e3:8.2f} ms/call  "
          f"{n/per_call/1e6:8.1f} Mray/s  (fixed {fixed*1e3:.1f} ms, "
          f"K2 {res[K_LO]*1e3:.1f} / K8 {res[K_HI]*1e3:.1f})", flush=True)
    return per_call


def main():
    boxes = int(sys.argv[1]) if len(sys.argv) > 1 else 8500
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    wanted = (sys.argv[4].split(",") if len(sys.argv) > 4 else
              ("primary_t", "shadow_t", "bounce", "bounce_sorted"))

    from tools.bench_trace import make_scene, workload_variant, tile_perm
    scene = make_scene(boxes)
    bvh = scene.bvh

    # one big pool of rays, sliced into distinct sets per chain link
    pool = K_HI + reps
    n = n_rays
    res = int(np.sqrt(n))
    vs = [workload_variant(scene, n, k)
          for k in jax.random.split(jax.random.PRNGKey(7), pool)]

    def stack(name):
        o = jnp.concatenate([v[name][0] for v in vs], axis=0)
        d = jnp.concatenate([v[name][1] for v in vs], axis=0)
        _, _, any_hit, tmin, tmax = vs[0][name]
        return o, d, any_hit, tmin, tmax

    for name in wanted:
        sort = name.endswith("_sorted")
        o, d, any_hit, tmin, tmax = stack(name.replace("_sorted", ""))
        true_rate(bvh, name, (o, d, any_hit, tmin, tmax, sort), reps)


if __name__ == "__main__":
    main()
