"""Attribute the PT bounce bundle: time each component on REAL bounce-2
ray distributions (chained fetch-fenced timing).

Usage: python tools/profile_pt_parts.py [boxes] [res] [frames]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

jax.config.update("jax_compilation_cache_dir", "/tmp/evplp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from evplp_tpu.core import brdf                              # noqa: E402
from evplp_tpu.core import mathutil as mu                    # noqa: E402
from evplp_tpu.core.sampling import iteration_key, uniform_not_one  # noqa: E402
from evplp_tpu.integrators.gbuffer import trace_gbuffer      # noqa: E402
from evplp_tpu.integrators import pt as ptmod                # noqa: E402
from evplp_tpu.scene.procedural import box_field             # noqa: E402
from evplp_tpu.scene.textures import fetch_hit_shading       # noqa: E402
from evplp_tpu.trace.intersect import (                      # noqa: E402
    intersect_closest, occluded_segment)


def timed(fn, frames, seed, state0):
    st = fn(state0, iteration_key(seed, 0))
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(st)[0].ravel()[0]))
    t0 = time.perf_counter()
    for i in range(frames):
        st = fn(st, iteration_key(seed, 1 + i))
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(st)[0].ravel()[0]))
    return (time.perf_counter() - t0) / frames * 1000.0


def main():
    boxes = int(sys.argv[1]) if len(sys.argv) > 1 else 8500
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    scene = box_field(num_boxes=boxes)
    n = res * res

    # ---- realistic bounce-2 state: two BRDF bounces from the gbuffer ----
    @jax.jit
    def make_state(key):
        gbuf = trace_gbuffer(scene, res, res, None)
        pos, nrm = gbuf.position, gbuf.normal
        inc = mu.normalize(jnp.asarray(scene.camera.origin)[None] - pos)
        active = (gbuf.stencil > 0.0) & ~brdf.is_black(gbuf.kd, gbuf.ks)
        kd, ks, ns = gbuf.kd, gbuf.ks, gbuf.ns
        for b in range(2):
            ks_ = jax.random.fold_in(key, b)
            u_sel = uniform_not_one(jax.random.uniform(
                jax.random.fold_in(ks_, 0), (n,)))
            u_lobe = jax.random.uniform(jax.random.fold_in(ks_, 1), (n, 2))
            direction, _, _, _ = brdf.sample_combined(
                u_sel, u_lobe, inc, nrm, nrm, kd, ks, ns)
            hit = intersect_closest(scene.tris, scene.bvh, pos, direction,
                                    t_min=1e-5,
                                    t_max=jnp.where(active, 3.0e38, 0.0),
                                    sort_rays=True)
            active = active & hit.valid
            pos = pos + hit.t[:, None] * direction
            prim = jnp.maximum(hit.prim, 0)
            kd, ks, ns, nrm, _ = fetch_hit_shading(scene, prim, hit.u, hit.v)
            inc = -mu.normalize(direction)
        return pos, nrm, inc, kd, ks, ns, direction, active

    pos, nrm, inc, kd, ks, ns, dirn, active = make_state(iteration_key(9, 7))
    jax.block_until_ready(pos)
    frac = float(active.mean())
    print(f"bounce-2 state ready, active {frac:.2f}", flush=True)

    # ---- components, each chained on an accumulator ----
    @jax.jit
    def c_closest(acc, key):
        u = jax.random.uniform(key, (n, 2))
        d2, _, _, _ = brdf.sample_combined(
            uniform_not_one(u[:, 0]), u, inc, nrm, nrm, kd, ks, ns)
        hit = intersect_closest(scene.tris, scene.bvh, pos, d2, t_min=1e-5,
                                t_max=jnp.where(active, 3.0e38, 0.0),
                                sort_rays=True)
        return acc + hit.t * (hit.prim >= 0)

    @jax.jit
    def c_nee_trace(acc, key):
        from evplp_tpu.core.light import light_sample
        u3 = jax.random.uniform(key, (n, 3))
        l_pos, _, _, _ = light_sample(scene.light, u3)
        occ = occluded_segment(scene.tris, scene.bvh, l_pos, pos,
                               eps=1e-5, live=active, sort_rays=True)
        return acc + occ.astype(jnp.float32)

    @jax.jit
    def c_shading(acc, key):
        # fetch_hit_shading on random prims (gather cost)
        pr = jax.random.randint(key, (n,), 0, scene.tris.v0.shape[0])
        u = jax.random.uniform(key, (n, 2))
        kd2, ks2, ns2, nn, il = fetch_hit_shading(scene, pr, u[:, 0], u[:, 1])
        return acc + kd2[:, 0] + ks2[:, 0] + ns2 + nn[:, 0] + il

    @jax.jit
    def c_nee_math(acc, key):
        # _nee WITHOUT the trace (occlusion forced free): estimator math only
        from evplp_tpu.core.light import light_sample
        u3 = jax.random.uniform(key, (n, 3))
        l_pos, l_n, l_pdf, l_val = light_sample(scene.light, u3)
        to_light = l_pos - pos
        to_light_n = mu.normalize(to_light)
        g = mu.geometry_term(nrm, l_n, to_light)
        emit = ptmod._emit_profile(l_n, -to_light_n, scene.light.intensity[3])
        p_l = brdf.p_select_lambert(kd, ks)
        w_l = mu.balance_heuristic(l_pdf, brdf.lambert_pdf_a(nrm, l_n, to_light))
        f_l = kd * brdf.lambert_eval_f(to_light_n, inc, nrm)
        c_l = (w_l * g * emit / jnp.maximum(p_l, 1e-8))[:, None] * l_val * f_l
        w_p = mu.balance_heuristic(
            l_pdf, brdf.phong_pdf_a(nrm, l_n, to_light, inc, ks, ns))
        f_p = brdf.phong_eval(to_light_n, inc, nrm, ks, ns)
        c_p = (w_p * g * emit)[:, None] * l_val * f_p
        return acc + c_l[:, 0] + c_p[:, 0]

    @jax.jit
    def c_sample(acc, key):
        u = jax.random.uniform(key, (n, 2))
        d2, pdf, w, _ = brdf.sample_combined(
            uniform_not_one(u[:, 0]), u, inc, nrm, nrm, kd, ks, ns)
        return acc + d2[:, 0] + pdf + w[:, 0]

    z = jnp.zeros((n,), jnp.float32)
    for tag, fn in (("closest(sorted)   ", c_closest),
                    ("nee trace(sorted) ", c_nee_trace),
                    ("shading gathers   ", c_shading),
                    ("nee math          ", c_nee_math),
                    ("brdf sample       ", c_sample)):
        ms = timed(fn, frames, hash(tag) % 1000, z)
        print(f"  {tag}: {ms:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
