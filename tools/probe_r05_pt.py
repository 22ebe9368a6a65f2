"""Round-5 PT levers, same-session sandwich (VERDICT r4 #5):

  a) sorted-state-ACROSS-bounces (EVPLP_PT_SORTED_CARRY 1 vs 0 vs 1 —
     the env knob is read at pt.py import, so each arm runs in a
     subprocess; A/B/A orders guard window drift),
  b) dead-tail marginal cost: sorted bounce-closest at live fractions
     1.0 / 0.6 / 0.3 / 0.0 — if time tracks the live fraction, all-dead
     packets are already ~free and dispatch-level skipping has no
     headroom (the grid is static under jit; skipping would need manual
     DMA restructuring, only worth it if this measures a large flat tax).

Usage: python tools/probe_r05_pt.py [frame|dead|arm <0|1>]
(default: full sandwich + dead-tail curve)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

W, H, BOXES, BOUNCES, REPS = 1280, 720, 8500, 3, 6


def arm():
    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_compilation_cache_dir", "/tmp/evplp_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from evplp_tpu.core.sampling import iteration_key
    from evplp_tpu.integrators.gbuffer import trace_gbuffer
    from evplp_tpu.integrators.pt import SORTED_CARRY, render_pt_frame
    from evplp_tpu.scene.procedural import box_field

    scene = box_field(num_boxes=BOXES)

    @jax.jit
    def frame(acc, key):
        gbuf = trace_gbuffer(scene, W, H, None)
        return acc + render_pt_frame(scene, gbuf, key, BOUNCES,
                                     tile_shape=(H, W))

    acc = jnp.zeros((W * H, 3), jnp.float32)
    acc = frame(acc, iteration_key(3, 0))
    np.asarray(jax.device_get(acc[0]))
    t0 = time.perf_counter()
    for i in range(REPS):
        acc = frame(acc, iteration_key(3, 1 + i))
    np.asarray(jax.device_get(acc[0]))
    ms = (time.perf_counter() - t0) / REPS * 1000.0
    print(json.dumps({"sorted_carry": SORTED_CARRY,
                      "pt_ms_per_frame": round(ms, 1),
                      "checksum": float(np.asarray(acc).sum())}),
          flush=True)


def frame_sandwich():
    for v in ("1", "0", "1", "0"):
        env = dict(os.environ, EVPLP_PT_SORTED_CARRY=v)
        subprocess.run([sys.executable, os.path.abspath(__file__), "arm"],
                       env=env, check=True)


def dead_tail():
    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_compilation_cache_dir", "/tmp/evplp_jax_cache")
    from evplp_tpu.scene.procedural import box_field
    from evplp_tpu.trace.intersect import intersect_closest

    scene = box_field(num_boxes=BOXES)
    n = 1 << 20
    k = jax.random.PRNGKey(11)
    lo, hi = scene.bvh.node_min[0], scene.bvh.node_max[0]
    o = jax.random.uniform(k, (n, 3)) * (hi - lo) * 0.9 + lo
    d = jax.random.normal(jax.random.fold_in(k, 1), (n, 3))

    for live in (1.0, 0.6, 0.3, 0.0):
        t_max = jnp.where(
            jax.random.uniform(jax.random.fold_in(k, 2), (n,)) < live,
            jnp.float32(3.0e38), jnp.float32(0.0))

        @jax.jit
        def step(carry, i):
            off = jnp.float32(1e-6) * i + 1e-9 * carry.sum()
            h = intersect_closest(scene.tris, scene.bvh, o + off, d,
                                  t_min=1e-5, t_max=t_max, sort_rays=True)
            return h.t, i + 1.0

        c = jnp.zeros((n,), jnp.float32)
        c, i = step(c, jnp.float32(0.0))
        np.asarray(jax.device_get(c[0]))
        t0 = time.perf_counter()
        for _ in range(4):
            c, i = step(c, i)
        np.asarray(jax.device_get(c[0]))
        ms = (time.perf_counter() - t0) / 4 * 1000.0
        print(json.dumps({"live_fraction": live,
                          "closest_ms_per_mray": round(ms, 1)}), flush=True)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "all"
    if cmd == "arm":
        arm()
    elif cmd == "frame":
        frame_sandwich()
    elif cmd == "dead":
        dead_tail()
    else:
        frame_sandwich()
        dead_tail()
