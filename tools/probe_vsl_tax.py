"""Split the VSL sample kernel's cost into LOOP TAX vs SAMPLE MATH:
monkeypatch vsl_kernel._kernel with a copy whose sample_step keeps the
exact loop/RNG structure but drops the 3-strategy math (results WRONG;
timing only), then time the production frame in the same process.

  frame(gutted) - gates  ~= loop tax + RNG
  frame(full)   - frame(gutted) ~= the 3-strategy vector math

Usage: python tools/probe_vsl_tax.py [scene] [frames]
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

from evplp_tpu.core import rng  # noqa: E402
from evplp_tpu.core.sampling import iteration_key                # noqa: E402
from evplp_tpu.integrators.gbuffer import trace_gbuffer          # noqa: E402
from evplp_tpu.integrators.light_trace import trace_light_paths  # noqa: E402
from evplp_tpu.integrators import vsl as vslmod                  # noqa: E402
from evplp_tpu.integrators import vsl_kernel as vk               # noqa: E402


def _gutted_kernel(group: int, rows: int):
    def kernel(pix_ref, pid_ref, gate_ref, cosh_ref, cnt_ref, rec_ref,
               int_ref, flt_ref, out_ref):
        p = (pix_ref[0], pix_ref[1], pix_ref[2])
        gates = gate_ref[...]
        pid = pid_ref[...]
        seed0 = int_ref[0]
        seed1 = int_ref[1]
        rec_base = int_ref[2]
        del flt_ref
        c0 = pid.astype(jnp.uint32) ^ jnp.uint32(seed0)

        def do_record(g, total):
            num = (cnt_ref[g // 4] >> (8 * (g % 4))) & 0xFF
            gate = ((gates >> g) & 1) > 0
            s_needed = jnp.minimum(
                jnp.max(jnp.where(gate, num, 0)), vk.MAX_VSL_SAMPLES)
            c1 = jnp.uint32(rec_base + g)
            flux0 = rec_ref[g, 9]

            def sample_step(s, acc):
                c2 = jnp.uint32(s) ^ jnp.uint32(seed1)
                u0, u1, u2, u3 = rng.uniform4(c0, c1, c2, jnp.uint32(0))
                u4, u5, u6, u7 = rng.uniform4(c0, c1, c2, jnp.uint32(1))
                use = s < num
                a0, a1, a2 = acc
                v = flux0 * (u0 + u1 + u2 + u3 + u4 + u5 + u6 + u7)
                return (a0 + jnp.where(use, v, 0.0), a1, a2)

            zero = jnp.zeros_like(p[0])
            acc = jax.lax.while_loop(
                lambda c: c[0] < s_needed,
                lambda c: (c[0] + 1, sample_step(c[0], c[1])),
                (jnp.int32(0), (zero, zero, zero)))[1]
            inv_n = 1.0 / jnp.maximum(num.astype(jnp.float32), 1.0)
            t0, t1, t2 = total
            return (t0 + jnp.where(gate, acc[0] * inv_n, 0.0),
                    t1 + jnp.where(gate, acc[1] * inv_n, 0.0),
                    t2 + jnp.where(gate, acc[2] * inv_n, 0.0))

        zero = jnp.zeros_like(p[0])
        tot = jax.lax.fori_loop(0, group, do_record, (zero, zero, zero))
        out_ref[0] = tot[0]
        out_ref[1] = tot[1]
        out_ref[2] = tot[2]

    return kernel


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

    def timed(tag):
        acc = frame(0)
        np.asarray(jax.device_get(acc.ravel()[0]))
        t0 = time.perf_counter()
        for i in range(frames):
            acc = acc + frame(1 + i)
        np.asarray(jax.device_get(acc.ravel()[0]))
        dt = (time.perf_counter() - t0) / frames * 1000.0
        print(f"  {tag:8s}: {dt:9.1f} ms/frame", flush=True)
        return dt

    t_full = timed("full")
    orig = vk._kernel
    vk._kernel = _gutted_kernel
    jax.clear_caches()
    try:
        t_gut = timed("gutted")
    finally:
        vk._kernel = orig
    print(f"  sample math (full - gutted): {t_full - t_gut:9.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
