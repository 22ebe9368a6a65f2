"""Round-5 VSL dispatch-chunk A/B: full protocol frame at
record_chunk 16 / 128 / 512 (25 / 4 / 1 dispatches per frame), same
process, same window.  Isolates the remote-tunnel dispatch overhead the
kernel-path chunk default now avoids (vsl.py VSL_RECORD_CHUNK_KERNEL).

Usage: python tools/probe_r05_vsl3.py [chunks ...]
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

from evplp_tpu.core.sampling import iteration_key  # noqa: E402
from evplp_tpu.integrators.gbuffer import trace_gbuffer  # noqa: E402
from evplp_tpu.integrators.light_trace import trace_light_paths  # noqa: E402
from evplp_tpu.integrators import vsl as vslmod  # noqa: E402
from evplp_tpu.scene.procedural import cornell_box  # noqa: E402

W, H, PATHS, BOUNCES, REPS = 1280, 720, 100, 3, 3


def main():
    chunks = [int(a) for a in sys.argv[1:]] or [128, 512, 128, 16]
    scene = cornell_box()
    radius = jnp.float32(max(scene.bounding_radius * 0.05, 0.008))
    gbuf = trace_gbuffer(scene, W, H, None)
    jax.block_until_ready(gbuf.position)

    def frame(i, chunk):
        pm = trace_light_paths(scene, iteration_key(2, i), PATHS,
                               BOUNCES + 1)
        return vslmod.vsl_gather(scene, gbuf, pm, iteration_key(5, i),
                                 radius, PATHS, tile_shape=(H, W),
                                 record_chunk=chunk)

    out = {}
    for chunk in chunks:
        r = frame(0, chunk)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for i in range(REPS):
            r = frame(1 + i, chunk)
        jax.block_until_ready(r)
        ms = (time.perf_counter() - t0) / REPS * 1000.0
        out.setdefault(f"chunk_{chunk}_ms", []).append(round(ms, 1))
        print(json.dumps({f"chunk_{chunk}_ms": round(ms, 1)}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
