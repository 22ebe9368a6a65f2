"""Round-5 VSL anatomy at the bench protocol shape (VERDICT r4 #4):
cornell, 1280x720, 100 light paths, vslRadius%=0.05.

Decomposes the frame into light-trace / occlusion / sampling and
measures the OCCLUSION FLOP FLOOR directly: the same (record x pixel)
segment count through the raw dense any-hit test with no VSL logic
around it.  If occlusion ~= floor and the sample half's levers are the
measured-flat ones (SKIP_EMPTY, unroll — vsl_kernel.py notes), the
<= 1.0 s ask is flop-floor-bound and the bound gets recorded; otherwise
the gap names the next lever.

Usage: python tools/probe_r05_vsl.py
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/evplp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from evplp_tpu.core.sampling import iteration_key  # noqa: E402
from evplp_tpu.integrators.gbuffer import trace_gbuffer  # noqa: E402
from evplp_tpu.integrators.light_trace import (FLAG_VPL,  # noqa: E402
                                               trace_light_paths)
from evplp_tpu.integrators import vsl as vslmod  # noqa: E402
from evplp_tpu.scene.procedural import cornell_box  # noqa: E402

W, H, PATHS, BOUNCES, REPS = 1280, 720, 100, 3, 3


def timed(fn, *args, reps=REPS):
    out = fn(*args, 0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(*args, 1 + i)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1000.0


def main():
    scene = cornell_box()
    radius = jnp.float32(max(scene.bounding_radius * 0.05, 0.008))
    gbuf = trace_gbuffer(scene, W, H, None)
    jax.block_until_ready(gbuf.position)
    n = W * H

    @jax.jit
    def lt(i):
        return trace_light_paths(scene, iteration_key(2, i), PATHS,
                                 BOUNCES + 1).flux

    ms_lt = timed(lambda i: lt(jnp.int32(i)), reps=REPS)

    def full(i):
        pm = trace_light_paths(scene, iteration_key(2, i), PATHS,
                               BOUNCES + 1)
        return vslmod.vsl_gather(scene, gbuf, pm, iteration_key(5, i),
                                 radius, PATHS, tile_shape=(H, W))

    ms_full = timed(lambda i: full(i), reps=REPS)

    # occlusion-only: the production _group_occlusion over every group
    pm = trace_light_paths(scene, iteration_key(2, 0), PATHS, BOUNCES + 1)
    records = vslmod._records_of(pm, PATHS)
    m = records["pos"].shape[0]
    g = vslmod.TRACE_GROUP
    pad = (-m) % g
    if pad:
        records = {k: jnp.concatenate(
            [v, jnp.zeros((pad,) + v.shape[1:], v.dtype)])
            for k, v in records.items()}
    mg = (m + pad) // g
    grouped = {k: v.reshape((mg, g) + v.shape[1:])
               for k, v in records.items()}
    live_recs = int(np.asarray(
        (records["flags"] & FLAG_VPL) != 0).sum())

    @jax.jit
    def occl_all(off, i):
        def step(acc, recs):
            gate = vslmod._group_occlusion(
                scene, gbuf.position + off * 0, gbuf.normal, gbuf.stencil,
                recs, (H, W))
            return acc + gate.sum(), None
        tot, _ = jax.lax.scan(step, jnp.int32(0) + i, grouped)
        return tot

    ms_occl = timed(lambda i: occl_all(jnp.float32(0), jnp.int32(i)),
                    reps=REPS)

    # dense floor: raw any-hit over the SAME segment count, no VSL logic
    from evplp_tpu.trace.intersect import occluded_segment

    @jax.jit
    def floor_step(acc, i):
        def step(acc, recs):
            seg_from = jnp.broadcast_to(recs["pos"][:, None, :],
                                        (g, n, 3)).reshape(-1, 3)
            seg_to = jnp.broadcast_to(gbuf.position[None],
                                      (g, n, 3)).reshape(-1, 3)
            occ = occluded_segment(scene.tris, scene.bvh, seg_from,
                                   seg_to + acc * 0, eps=1e-4,
                                   tile_shape=(g * H, W))
            return acc + occ.sum(), None
        tot, _ = jax.lax.scan(step, jnp.int32(0) + i, grouped)
        return tot

    ms_floor = timed(lambda i: floor_step(jnp.int32(0), jnp.int32(i)),
                     reps=REPS)

    out = {
        "protocol": f"cornell {W}x{H}, {PATHS} paths",
        "records_total": m, "records_live": live_recs,
        "vsl_full_ms": round(ms_full, 1),
        "light_trace_ms": round(ms_lt, 1),
        "occlusion_ms": round(ms_occl, 1),
        "occlusion_floor_ms": round(ms_floor, 1),
        "sampling_ms_approx": round(ms_full - ms_occl - ms_lt, 1),
        "occl_overhead_x": round(ms_occl / max(ms_floor, 1e-9), 2),
    }
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
