"""Does octant-sorting incoherent bounce rays pay on TPU?

Measures separately, with the cache-safe harness:
  1. bounce trace, unsorted (status quo)
  2. bounce trace, pre-sorted by direction octant GLOBALLY
  3. bounce trace, pre-sorted by octant WITHIN 32k-ray groups
     (origins stay tile-local; packets become octant-pure)
  4. the permutation machinery itself: key + argsort + gather + scatter-back

Usage: python tools/bench_sort.py [boxes] [rays] [reps]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tools.bench_trace import bench, checksum, make_scene, make_variants  # noqa: E402


def octant_key(d):
    return ((d[:, 0] < 0).astype(jnp.int32) * 4
            + (d[:, 1] < 0).astype(jnp.int32) * 2
            + (d[:, 2] < 0).astype(jnp.int32))


@jax.jit
def sort_global(o, d, tmin, tmax):
    k = octant_key(d)
    perm = jnp.argsort(k, stable=True)
    return o[perm], d[perm], tmin[perm], tmax[perm], perm


@jax.jit
def sort_grouped(o, d, tmin, tmax, group=32768):
    n = o.shape[0]
    g = n // group
    k = octant_key(d).reshape(g, group)
    perm = jnp.argsort(k, axis=1, stable=True)
    base = (jnp.arange(g, dtype=perm.dtype) * group)[:, None]
    perm = (perm + base).reshape(-1)
    return o[perm], d[perm], tmin[perm], tmax[perm], perm


def main():
    boxes = int(sys.argv[1]) if len(sys.argv) > 1 else 8500
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    scene = make_scene(boxes)
    variants = make_variants(scene, n_rays, reps)
    bvh = scene.bvh

    from evplp_tpu.trace.packet3 import packet3_trace

    def trace(o, d, tmin, tmax):
        n = o.shape[0]
        return packet3_trace(
            bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds, bvh.pk_prim_map,
            o, d, jnp.asarray(tmin, jnp.float32) if hasattr(tmin, "shape")
            else jnp.full((n,), tmin, jnp.float32),
            jnp.asarray(tmax, jnp.float32) if hasattr(tmax, "shape")
            else jnp.full((n,), tmax, jnp.float32), any_hit=False)

    def full(tmin_s, tmax_s):
        def f(o, d, tmin, tmax):
            n = o.shape[0]
            tmin = jnp.full((n,), tmin, jnp.float32)
            tmax = jnp.full((n,), tmax, jnp.float32)
            return trace(o, d, tmin, tmax)
        return f

    # 1. unsorted baseline
    dt, _ = bench(full(None, None), variants, "bounce")
    print(f"bounce unsorted : {n_rays/dt/1e6:7.2f} Mray/s "
          f"({dt*1e3:.1f} ms)", flush=True)

    # 2/3. pre-sorted trace (sorting OUTSIDE the timed region = ceiling)
    for label, sorter in (("global ", sort_global),
                          ("grouped", lambda *a: sort_grouped(*a))):
        pre = []
        for v in variants:
            o, d, _, tmin, tmax = v["bounce"]
            n = o.shape[0]
            tmin = jnp.full((n,), tmin, jnp.float32)
            tmax = jnp.full((n,), tmax, jnp.float32)
            os_, ds_, tn_, tx_, _ = sorter(o, d, tmin, tmax)
            pre.append(jax.block_until_ready((os_, ds_, tn_, tx_)))
        out = trace(*pre[0])
        jax.block_until_ready(out)
        times, sums = [], set()
        for p in pre[1:]:
            t0 = time.perf_counter()
            out = trace(*p)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
            sums.add(checksum(out))
        dt = float(np.median(times))
        tag = " CACHE?" if len(sums) < max(2, len(times) // 2) else ""
        print(f"bounce {label} : {n_rays/dt/1e6:7.2f} Mray/s "
              f"({dt*1e3:.1f} ms){tag}", flush=True)

    # 4. permutation machinery cost (sort + gather in, scatter back)
    @jax.jit
    def roundtrip(o, d, tmin, tmax):
        os_, ds_, tn_, tx_, perm = sort_grouped(o, d, tmin, tmax)
        # fake per-ray results to scatter back (same dtypes as trace out)
        t = tn_ + ds_[:, 0]
        prim = perm.astype(jnp.int32)
        u = tx_ * 0.5
        v = tx_ * 0.25
        inv = jnp.zeros_like(perm).at[perm].set(
            jnp.arange(perm.shape[0], dtype=perm.dtype))
        return t[inv], prim[inv], u[inv], v[inv]

    def f4(o, d, tmin, tmax):
        n = o.shape[0]
        return roundtrip(o, d, jnp.full((n,), tmin, jnp.float32),
                         jnp.full((n,), tmax, jnp.float32))

    dt, _ = bench(f4, variants, "bounce")
    print(f"perm machinery  : {dt*1e3:7.2f} ms "
          f"({n_rays/dt/1e6:.1f} Mray/s equivalent)", flush=True)


if __name__ == "__main__" and (len(sys.argv) <= 1 or sys.argv[1] != "comp"):
    main()


def probe_components():
    """Time the permutation pieces + a spatial+octant key ceiling."""
    import os
    boxes, n_rays, reps = 8500, 1 << 20, 5
    seed = int.from_bytes(os.urandom(4), "little")
    scene = make_scene(boxes)
    variants = make_variants(scene, n_rays, reps, seed=seed)
    bvh = scene.bvh
    from evplp_tpu.trace.packet3 import packet3_trace

    def trace(o, d, tmin, tmax):
        return packet3_trace(
            bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds, bvh.pk_prim_map,
            o, d, tmin, tmax, any_hit=False)

    lo = jnp.asarray(scene.bvh.node_min[0])
    inv_ext = 1.0 / jnp.maximum(jnp.asarray(scene.bvh.node_max[0]) - lo, 1e-6)

    @jax.jit
    def key_oct(d):
        return octant_key(d)

    @jax.jit
    def key_oct_morton(o, d):
        # 3-bit octant + 6-bit coarse cell (2 bits/axis, no interleave —
        # locality at this granularity doesn't need true morton)
        cell = jnp.clip(((o - lo) * inv_ext * 4).astype(jnp.int32), 0, 3)
        return (octant_key(d) * 64 + cell[:, 0] * 16 + cell[:, 1] * 4
                + cell[:, 2])

    @jax.jit
    def argsort_only(k):
        return jnp.argsort(k, stable=True)

    @jax.jit
    def gather8(o, d, tmin, tmax, perm):
        return o[perm], d[perm], tmin[perm], tmax[perm]

    @jax.jit
    def inv_scatter(perm):
        return jnp.zeros_like(perm).at[perm].set(
            jnp.arange(perm.shape[0], dtype=perm.dtype))

    import time as _t
    # component timings (pipelined over variants)
    ks = []
    for v in variants:
        o, d, *_ = v["bounce"]
        ks.append(jax.block_until_ready(key_oct_morton(o, d)))
    for label, fn, args_of in (
            ("key    ", key_oct_morton,
             lambda v, k: (v["bounce"][0], v["bounce"][1])),
            ("argsort", argsort_only, lambda v, k: (k,)),
            ("gather8", gather8,
             lambda v, k: (v["bounce"][0], v["bounce"][1],
                           jnp.full((n_rays,), 1e-4, jnp.float32),
                           jnp.full((n_rays,), 3e38, jnp.float32),
                           argsort_only(k))),
            ("invperm", inv_scatter, lambda v, k: (argsort_only(k),))):
        outs = []
        jax.block_until_ready(fn(*args_of(variants[0], ks[0])))
        t0 = _t.perf_counter()
        for v, k in zip(variants[1:], ks[1:]):
            outs.append(fn(*args_of(v, k)))
        jax.block_until_ready(outs)
        print(f"{label}: {(_t.perf_counter()-t0)/reps*1e3:8.2f} ms",
              flush=True)

    # sorted-trace ceiling with octant+morton key
    pre = []
    for v, k in zip(variants, ks):
        o, d, *_ = v["bounce"]
        perm = argsort_only(k)
        tmin = jnp.full((n_rays,), 1e-4, jnp.float32)
        tmax = jnp.full((n_rays,), 3e38, jnp.float32)
        pre.append(jax.block_until_ready(
            (o[perm], d[perm], tmin, tmax)))
    jax.block_until_ready(trace(*pre[0]))
    t0 = _t.perf_counter()
    outs = [trace(*p) for p in pre[1:]]
    jax.block_until_ready(outs)
    dt = (_t.perf_counter() - t0) / reps
    print(f"bounce oct+morton sorted: {n_rays/dt/1e6:7.2f} Mray/s "
          f"({dt*1e3:.1f} ms)", flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "comp":
    probe_components()
