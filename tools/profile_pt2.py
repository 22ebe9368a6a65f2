"""PT bounce internals ablation (TPU): where do the ~160 ms/bounce of
non-trace costs go?

Variants (all 3 chained bounces at 1M rays on the bench scene, frame-level
fetch-fenced timing):
  A  3x sorted closest trace only
  B  A + fetch_hit_shading row gather per bounce
  C  B + sorted NEE any-hit (occluded_segment, live=hit) per bounce
  D  C + dead NEE (live=False — bounce-3 cost in the scan body)
  F  full render_pt_frame (reference)

Usage: python tools/profile_pt2.py [boxes] [res] [frames]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from evplp_tpu.core import mathutil as mu                     # noqa: E402
from evplp_tpu.core.light import light_sample                 # noqa: E402
from evplp_tpu.core.sampling import iteration_key             # noqa: E402
from evplp_tpu.integrators.gbuffer import trace_gbuffer       # noqa: E402
from evplp_tpu.integrators.pt import render_pt_frame          # noqa: E402
from evplp_tpu.scene.procedural import box_field              # noqa: E402
from evplp_tpu.scene.textures import fetch_hit_shading        # noqa: E402
from evplp_tpu.trace.intersect import (intersect_closest,     # noqa: E402
                                       occluded_segment)


def timed(fn, acc0, frames, seed):
    acc = fn(acc0, iteration_key(seed, 0))
    np.asarray(jax.device_get(acc.ravel()[0]))
    t0 = time.perf_counter()
    for i in range(frames):
        acc = fn(acc, iteration_key(seed, 1 + i))
    np.asarray(jax.device_get(acc.ravel()[0]))
    return (time.perf_counter() - t0) / frames * 1000.0


def main():
    boxes = int(sys.argv[1]) if len(sys.argv) > 1 else 8500
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    scene = box_field(num_boxes=boxes)
    n = res * res

    def bounce_dirs(key, pos):
        u = jax.random.uniform(key, (n, 2))
        z = u[:, 0] * 2.0 - 1.0
        phi = 2 * jnp.pi * u[:, 1]
        r = jnp.sqrt(jnp.maximum(1 - z * z, 0.0))
        return jnp.stack([r * jnp.cos(phi), z, r * jnp.sin(phi)], axis=-1)

    def base(acc, key, shading, nee, dead_nee):
        g = trace_gbuffer(scene, res, res, None)
        pos = g.position
        total = acc
        for b in range(3):
            kb = jax.random.fold_in(key, b)
            d = bounce_dirs(jax.random.fold_in(kb, 0), pos)
            hit = intersect_closest(scene.tris, scene.bvh, pos, d,
                                    t_min=1e-5, sort_rays=True)
            new_pos = pos + hit.t[:, None] * d
            live = hit.prim >= 0
            if shading:
                kd, ks, ns, gn, is_l = fetch_hit_shading(
                    scene, jnp.maximum(hit.prim, 0), hit.u, hit.v)
                total = total + jnp.where(live[:, None], kd, 0.0)
            if nee:
                u3 = jax.random.uniform(jax.random.fold_in(kb, 1), (n, 3))
                l_pos, l_n, l_pdf, l_val = light_sample(scene.light, u3)
                occ = occluded_segment(scene.tris, scene.bvh, l_pos, new_pos,
                                       eps=1e-5, live=live, sort_rays=True)
                total = total + jnp.where((live & ~occ)[:, None], 0.01, 0.0)
            if dead_nee:
                u3 = jax.random.uniform(jax.random.fold_in(kb, 2), (n, 3))
                l_pos2, _, _, _ = light_sample(scene.light, u3)
                occ2 = occluded_segment(
                    scene.tris, scene.bvh, l_pos2, new_pos, eps=1e-5,
                    live=jnp.zeros((n,), bool), sort_rays=True)
                total = total + jnp.where(occ2[:, None], 0.0, 0.0)
            pos = jnp.where(live[:, None], new_pos, pos)
        return total + 0.0 * pos

    acc0 = jnp.zeros((n, 3), jnp.float32)
    for label, kw in (
        ("A trace only", dict(shading=False, nee=False, dead_nee=False)),
        ("B +shading", dict(shading=True, nee=False, dead_nee=False)),
        ("C +NEE", dict(shading=True, nee=True, dead_nee=False)),
        ("D +deadNEE", dict(shading=True, nee=True, dead_nee=True)),
    ):
        f = jax.jit(lambda acc, key, kw=kw: base(acc, key, **kw))
        ms = timed(f, acc0, frames, hash(label) % 1000)
        print(f"{label:14s} {ms:8.1f} ms", flush=True)

    @jax.jit
    def full(acc, key):
        g = trace_gbuffer(scene, res, res, None)
        return acc + render_pt_frame(scene, g, key, 3, tile_shape=(res, res))
    ms = timed(full, acc0, frames, 99)
    print(f"F full frame   {ms:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
