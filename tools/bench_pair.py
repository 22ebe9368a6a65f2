"""A/B the paired NEE+extension trace vs separate sorted dispatches.

PT's per-vertex workload at the bounce distribution: closest along
BRDF-sampled hemisphere dirs + any-hit segments from the SAME origins to a
jittered light point.  Three measurements through the production dispatch:

  sep    — sorted closest + sorted any-hit (the round-2 PT formulation)
  pair   — closest_and_segment (one shared sort, one fused kernel walk)

Measurement rules per NOTES.md: fresh RNG-derived inputs per rep, per-rep
block_until_ready fences, checksums verified distinct, medians; run sep and
pair interleaved (sandwich) so tunnel drift cancels.

Usage: python tools/bench_pair.py [boxes] [rays] [reps]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tools.bench_trace import make_scene, make_variants  # noqa: E402
from evplp_tpu.trace.intersect import (closest_and_segment,  # noqa: E402
                                       intersect_closest, occluded_segment)


def pair_inputs(scene, variants, seed=77):
    """Per-rep (o, d, seg_to, live): bounce rays + segments to a jittered
    point on the light, ~25% pre-culled."""
    lp = np.asarray(scene.light.v0).reshape(-1, 3).mean(axis=0)
    out = []
    rng = np.random.default_rng(seed)
    for v in variants:
        o, d, _, tmin, tmax = v["bounce"]
        n = o.shape[0]
        jit = rng.normal(0, 0.05, (1, 3)).astype(np.float32)
        seg_to = jnp.asarray(np.broadcast_to(lp + jit, (n, 3)),
                             jnp.float32)
        live = jnp.asarray(rng.uniform(size=n) > 0.25)
        out.append((o, d, seg_to, live, tmin, tmax))
    jax.block_until_ready(out)
    return out


def main():
    boxes = int(sys.argv[1]) if len(sys.argv) > 1 else 8500
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    scene = make_scene(boxes)
    variants = make_variants(scene, n_rays, reps)
    pv = pair_inputs(scene, variants)
    tris, bvh = scene.tris, scene.bvh

    def sep(o, d, seg_to, live):
        h = intersect_closest(tris, bvh, o, d, t_min=1e-5, sort_rays=True)
        occ = occluded_segment(tris, bvh, seg_to, o, eps=1e-5, live=live,
                               sort_rays=True)
        return h.t, h.prim, occ

    def pair(o, d, seg_to, live):
        h, occ = closest_and_segment(tris, bvh, o, d, t_min=1e-5,
                                     t_max=3.0e38, seg_to=seg_to,
                                     seg_eps=1e-5, seg_live=live)
        return h.t, h.prim, occ

    fns = {"sep": sep, "pair": pair}
    # warmup (compile) both
    o, d, seg_to, live, *_ = pv[0]
    warm = {k: f(o, d, seg_to, live) for k, f in fns.items()}
    jax.block_until_ready(warm)
    # cross-validate outputs on the warmup inputs
    ws, wp = warm["sep"], warm["pair"]
    lv = np.asarray(live)
    agree_p = float(np.mean(np.asarray(ws[1]) == np.asarray(wp[1])))
    agree_o = float(np.mean(np.asarray(ws[2])[lv] == np.asarray(wp[2])[lv]))
    print(f"agreement: prim {agree_p:.4f}  occ(live) {agree_o:.4f}",
          flush=True)

    times = {k: [] for k in fns}
    sums = {k: set() for k in fns}
    for v in pv[1:]:
        o, d, seg_to, live, *_ = v
        for k, f in fns.items():          # interleaved sandwich
            t0 = time.perf_counter()
            r = f(o, d, seg_to, live)
            jax.block_until_ready(r)
            times[k].append(time.perf_counter() - t0)
            sums[k].add((int(jnp.sum(r[1] >= 0)),
                         int(jnp.sum(r[2].astype(jnp.int32)))))

    for k in fns:
        dt = float(np.median(times[k]))
        spread = (max(times[k]) - min(times[k])) / dt * 100
        flag = "  CACHE SUSPECT" if len(sums[k]) < max(2, reps // 2) else ""
        print(f"  {k:5s} {dt*1e3:8.2f} ms  {n_rays/dt/1e6:7.2f} Mray/s"
              f"  (spread {spread:.0f}%){flag}", flush=True)
    r = float(np.median(times["sep"])) / float(np.median(times["pair"]))
    print(f"speedup pair/sep: {r:.2f}x")


if __name__ == "__main__":
    main()
