"""VSL frame cost at protocol scale (1280x720, 100 paths, r%=0.05) —
pixel-sorted vs unsorted.  Frame-level fetch-fenced timing.

Usage: python tools/bench_vsl.py [scene] [frames]
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


def main():
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "cornell"
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from evplp_tpu.scene.config import load_config
    job = load_config(os.path.join("/root/repo/configs", scene_name,
                                   f"{scene_name}_vsl.json"))
    scene = job.scene
    W, H = job.width, job.height
    n_paths = job.params.num_vpl_light_paths          # 100
    radius = jnp.float32(
        max(scene.bounding_radius * job.params.vsl_radius_percentage, 0.008))
    print(f"{scene_name} {W}x{H}, {n_paths} paths, radius {radius}",
          flush=True)

    gbuf = trace_gbuffer(scene, W, H, None)
    jax.block_until_ready(gbuf.position)

    for pixel_sort in (True, False):
        def frame(i):
            pm = trace_light_paths(scene, iteration_key(3, i), n_paths,
                                   job.params.num_max_bounces + 1)
            return vslmod.vsl_gather(
                scene, gbuf, pm, iteration_key(4, i), radius, n_paths,
                tile_shape=(H, W), pixel_sort=pixel_sort)

        acc = frame(0)
        np.asarray(jax.device_get(acc.ravel()[0]))
        t0 = time.perf_counter()
        for i in range(frames):
            acc = acc + frame(1 + i)
        np.asarray(jax.device_get(acc.ravel()[0]))
        dt = (time.perf_counter() - t0) / frames
        print(f"  pixel_sort={pixel_sort}: {dt*1e3:9.1f} ms/frame",
              flush=True)
        if not pixel_sort and dt > 60:
            break


def floor_probe():
    """Timing floor: trace + overhead with the sample loops clamped to 1
    step (results WRONG; timing only) + SORT_CHUNKS sweep."""
    import tools.bench_vsl as me  # noqa
    sys.argv = [sys.argv[0], sys.argv[2] if len(sys.argv) > 2 else "cornell"]
    scene_name = sys.argv[1]
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

    for tag, max_s, chunks in (("floor(max=1)", 1, 16),
                               ("chunks=64", 101, 64),
                               ("chunks=16", 101, 16)):
        vslmod.MAX_VSL_SAMPLES = max_s
        vslmod.SORT_CHUNKS = chunks
        def frame(i):
            pm = trace_light_paths(scene, iteration_key(3, i), n_paths,
                                   job.params.num_max_bounces + 1)
            return vslmod.vsl_gather(
                scene, gbuf, pm, iteration_key(4, i), radius, n_paths,
                tile_shape=(H, W), pixel_sort=True)
        acc = frame(0)
        np.asarray(jax.device_get(acc.ravel()[0]))
        t0 = time.perf_counter()
        acc = acc + frame(1)
        np.asarray(jax.device_get(acc.ravel()[0]))
        dt = time.perf_counter() - t0
        print(f"  {tag}: {dt*1e3:9.1f} ms/frame", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "floor":
        floor_probe()
    else:
        main()
