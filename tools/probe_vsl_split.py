"""Split the VSL protocol frame: occlusion-gates cost vs sample-kernel
cost (decides VERDICT r3 #4 — whether folding occlusion into the sample
kernel is worth it, or the frame is sample-bound).

Times three chained variants at protocol scale (fetch-fenced):
  full    — the production vsl_gather
  gates   — _group_occlusion only, scanned over the same record groups
  trace0  — vsl_gather with the shadow trace forced trivially empty
            (occlusion replaced by the pre-mask; WRONG results, timing
            only) — isolates the sample kernel + fixed costs

Usage: python tools/probe_vsl_split.py [scene] [frames]
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
    n_paths = job.params.num_vpl_light_paths
    radius = jnp.float32(
        max(scene.bounding_radius * job.params.vsl_radius_percentage, 0.008))
    gbuf = trace_gbuffer(scene, W, H, None)
    jax.block_until_ready(gbuf.position)

    def timed(fn, tag):
        acc = fn(0)
        np.asarray(jax.device_get(acc.ravel()[0]))
        t0 = time.perf_counter()
        for i in range(frames):
            acc = acc + fn(1 + i)
        np.asarray(jax.device_get(acc.ravel()[0]))
        dt = (time.perf_counter() - t0) / frames * 1000.0
        print(f"  {tag:8s}: {dt:9.1f} ms/frame", flush=True)
        return dt

    def full(i):
        pm = trace_light_paths(scene, iteration_key(3, i), n_paths,
                               job.params.num_max_bounces + 1)
        return vslmod.vsl_gather(scene, gbuf, pm, iteration_key(4, i),
                                 radius, n_paths, tile_shape=(H, W))

    # gates only: the same record grouping + _group_occlusion, nothing else
    @jax.jit
    def gates_frame(pm_key):
        pm = trace_light_paths(scene, pm_key, n_paths,
                               job.params.num_max_bounces + 1)
        records = vslmod._records_of(pm, n_paths)
        m = records["pos"].shape[0]
        pad = (-m) % vslmod.TRACE_GROUP
        if pad:
            records = {k: jnp.concatenate(
                [v, jnp.zeros((pad,) + v.shape[1:], v.dtype)])
                for k, v in records.items()}
        mg = (m + pad) // vslmod.TRACE_GROUP
        grouped = {k: v.reshape((mg, vslmod.TRACE_GROUP) + v.shape[1:])
                   for k, v in records.items()}
        screen = (gbuf.position, gbuf.normal, gbuf.stencil)

        def step(acc, recs):
            g = vslmod._group_occlusion(scene, *screen, recs, (H, W))
            return acc + jnp.sum(g.astype(jnp.int32), axis=0), None
        acc, _ = jax.lax.scan(
            step, jnp.zeros(gbuf.position.shape[0], jnp.int32), grouped)
        return acc

    def gates(i):
        return gates_frame(iteration_key(3, i)).astype(jnp.float32)

    t_full = timed(full, "full")
    t_gates = timed(gates, "gates")
    print(f"  sample+fixed residue: {t_full - t_gates:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
