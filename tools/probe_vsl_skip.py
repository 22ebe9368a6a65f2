"""Same-process A/B of vsl_kernel.SKIP_EMPTY (branch over the sample
loop for gate-empty (record, block) pairs) at protocol scale.

Usage: python tools/probe_vsl_skip.py [scene] [frames]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/evplp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from evplp_tpu.core.sampling import iteration_key                # noqa: E402
from evplp_tpu.integrators.gbuffer import trace_gbuffer          # noqa: E402
from evplp_tpu.integrators.light_trace import trace_light_paths  # noqa: E402
from evplp_tpu.integrators import vsl as vslmod                  # noqa: E402
from evplp_tpu.integrators import vsl_kernel as vk               # noqa: E402


def main():
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "cornell"
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from evplp_tpu.scene.config import load_config
    job = load_config(os.path.join("/root/repo/configs", scene_name,
                                   f"{scene_name}_vsl.json"))
    scene = job.scene
    W, H = job.width, job.height
    n_paths = job.params.num_vpl_light_paths
    radius = jnp.float32(
        max(scene.bounding_radius * job.params.vsl_radius_percentage, 0.008))
    gbuf = trace_gbuffer(scene, W, H, None)
    jax.block_until_ready(gbuf.position)

    def frame(i):
        pm = trace_light_paths(scene, iteration_key(3, i), n_paths,
                               job.params.num_max_bounces + 1)
        return vslmod.vsl_gather(scene, gbuf, pm, iteration_key(4, i),
                                 radius, n_paths, tile_shape=(H, W))

    for skip in (True, False, True):
        vk.SKIP_EMPTY = skip
        jax.clear_caches()
        acc = frame(0)
        np.asarray(jax.device_get(acc.ravel()[0]))
        t0 = time.perf_counter()
        for i in range(frames):
            acc = acc + frame(1 + i)
        np.asarray(jax.device_get(acc.ravel()[0]))
        dt = (time.perf_counter() - t0) / frames * 1000.0
        print(f"  skip_empty={int(skip)}: {dt:9.1f} ms/frame  "
              f"checksum {float(jnp.sum(acc)):.6e}", flush=True)


if __name__ == "__main__":
    main()
