"""A/B the VPL shadow workload: record-major single segments vs
pixel-major dual-segment pairs (occluded_segment_pair).

Reproduces vpl_chunk_contribution's exact trace shapes at reference
settings (1024^2 pixels x 120 records, pre-culled pairs) and times ONLY
the shadow traversal, interleaved sandwich-style with fresh light paths
per rep (NOTES.md measurement rules).

Usage: python tools/bench_vplpair.py [boxes] [res] [reps]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from evplp_tpu.core.sampling import iteration_key                  # noqa: E402
from evplp_tpu.integrators.gbuffer import trace_gbuffer            # noqa: E402
from evplp_tpu.integrators.light_trace import (FLAG_VPL,           # noqa: E402
                                               trace_light_paths)
from evplp_tpu.scene.procedural import box_field                   # noqa: E402
from evplp_tpu.trace.intersect import (occluded_segment,           # noqa: E402
                                       occluded_segment_pair)

NUM_VPL_PATHS = 30
NUM_BOUNCES = 3


def make_workload(scene, gbuf, key, res):
    """One rep's record set + pre-cull masks, Morton-sorted like
    vpl_gather's VPL_PAIR path."""
    pm = trace_light_paths(scene, key, NUM_VPL_PATHS, NUM_BOUNCES + 1)
    flat = pm.flat()
    pos, normal, flags = flat.pos, flat.normal, flat.flags

    lo = scene.bvh.node_min[0]
    inv_ext = 1.0 / jnp.maximum(scene.bvh.node_max[0] - lo, 1e-6)
    cell = jnp.clip(((pos - lo) * inv_ext * 64).astype(jnp.int32), 0, 63)
    code = jnp.zeros_like(cell[:, 0])
    for b in range(6):
        code = (code
                | (((cell[:, 0] >> b) & 1) << (3 * b + 2))
                | (((cell[:, 1] >> b) & 1) << (3 * b + 1))
                | (((cell[:, 2] >> b) & 1) << (3 * b)))
    code = jnp.where((flags & FLAG_VPL) != 0, code, jnp.int32(1) << 20)
    ordr = jnp.argsort(code, stable=True)
    pos, normal, flags = pos[ordr], normal[ordr], flags[ordr]

    c = pos.shape[0]
    if c % 2:
        c -= 1
        pos, normal, flags = pos[:c], normal[:c], flags[:c]
    v12 = pos[None, :, :] - gbuf.position[:, None, :]
    ucos1 = jnp.maximum(jnp.sum(gbuf.normal[:, None, :] * v12, -1), 0.0)
    ucos2 = jnp.maximum(-jnp.sum(normal[None, :, :] * v12, -1), 0.0)
    pretest = (((ucos1 * ucos2) > 0.0)
               & (gbuf.stencil > 0.0)[:, None]
               & ((flags & FLAG_VPL) != 0)[None, :])        # (N, C)
    return pos, pretest, c


def main():
    boxes = int(sys.argv[1]) if len(sys.argv) > 1 else 8500
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    scene = box_field(num_boxes=boxes)
    print(f"scene: {scene.tris.v0.shape[0]} tris", flush=True)
    gbuf = trace_gbuffer(scene, res, res)
    jax.block_until_ready(gbuf.position)
    n = res * res
    tris, bvh = scene.tris, scene.bvh

    def single(pos, pretest, c):
        seg_from = jnp.broadcast_to(pos[:, None, :], (c, n, 3)).reshape(-1, 3)
        seg_to = jnp.broadcast_to(gbuf.position[None, :, :],
                                  (c, n, 3)).reshape(-1, 3)
        occ = occluded_segment(tris, bvh, seg_from, seg_to, eps=1e-4,
                               live=pretest.T.reshape(-1),
                               tile_shape=(c * res, res))
        return occ.reshape(c, n)

    def pair(pos, pretest, c):
        p = c // 2
        o = jnp.broadcast_to(gbuf.position[None, :, :],
                             (p, n, 3)).reshape(-1, 3)
        to_a = jnp.broadcast_to(pos[0::2][:, None, :],
                                (p, n, 3)).reshape(-1, 3)
        to_b = jnp.broadcast_to(pos[1::2][:, None, :],
                                (p, n, 3)).reshape(-1, 3)
        occ_a, occ_b = occluded_segment_pair(
            tris, bvh, o, to_a, to_b, eps=1e-4,
            live_a=pretest.T[0::2].reshape(-1),
            live_b=pretest.T[1::2].reshape(-1),
            tile_shape=(p * res, res))
        return jnp.stack([occ_a.reshape(p, n), occ_b.reshape(p, n)],
                         axis=1).reshape(c, n)

    fns = {"single": single, "pair": pair}
    w0 = make_workload(scene, gbuf, iteration_key(2, 0), res)
    jax.block_until_ready(w0)
    warm = {k: f(*w0) for k, f in fns.items()}
    jax.block_until_ready(warm)
    lv = np.asarray(w0[1].T)
    agree = float(np.mean(np.asarray(warm["single"])[lv]
                          == np.asarray(warm["pair"])[lv]))
    print(f"agreement on live pairs: {agree:.4f}", flush=True)

    times = {k: [] for k in fns}
    sums = {k: set() for k in fns}
    nrays = None
    for i in range(reps):
        w = make_workload(scene, gbuf, iteration_key(2, 1 + i), res)
        jax.block_until_ready(w)
        nrays = int(w[2]) * n
        for k, f in fns.items():
            t0 = time.perf_counter()
            r = f(*w)
            jax.block_until_ready(r)
            times[k].append(time.perf_counter() - t0)
            sums[k].add(int(jnp.sum(r.astype(jnp.int32))))

    for k in fns:
        dt = float(np.median(times[k]))
        spread = (max(times[k]) - min(times[k])) / dt * 100
        flag = "  CACHE SUSPECT" if len(sums[k]) < max(2, reps // 2) else ""
        print(f"  {k:6s} {dt*1e3:8.2f} ms  {nrays/dt/1e6:7.1f} Mray/s"
              f"  (spread {spread:.0f}%){flag}", flush=True)
    r = float(np.median(times["single"])) / float(np.median(times["pair"]))
    print(f"speedup pair/single: {r:.2f}x")


if __name__ == "__main__":
    main()
