"""Tracer microbench at real scene scale (run on TPU).

Workloads mirror the renderer's actual ray mixes on a >=100k-triangle scene:
  primary   — coherent camera rays (closest hit), tile-swizzled variant too
  shadow    — VPL shadow segments: pixel positions -> one light point
              (any hit), the EVPLP hot loop's shape
  bounce    — incoherent hemisphere rays from surface points (closest hit)

MEASUREMENT RULES (NOTES.md: the tunnel caches results keyed by an
approximate input fingerprint — 1e-6-perturbed inputs can collide):
  * every timed rep uses inputs derived from a fresh RNG key (strongly
    different rays, not epsilon jitters);
  * each rep is timed individually with block_until_ready between;
  * outputs are checksummed per rep and verified to differ;
  * report the median rep.

Usage: python tools/bench_trace.py [boxes] [rays] [reps]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


def make_scene(boxes: int):
    from evplp_tpu.scene.procedural import box_field
    s = box_field(num_boxes=boxes)
    print(f"scene: {s.tris.v0.shape[0]} tris, "
          f"{s.bvh.node_min.shape[0]} nodes", flush=True)
    return s


def tile_perm(res, th=64, tw=128):
    idx = np.arange(res * res).reshape(res, res)
    idx = idx.reshape(res // th, th, res // tw, tw)
    return jnp.asarray(idx.transpose(0, 2, 1, 3).reshape(-1))


def workload_variant(scene, n_rays: int, key):
    """One full set of (o, d, tmin, tmax) per workload, derived from `key`
    so successive variants are strongly different rays."""
    res = int(np.sqrt(n_rays))
    k_cam, k_light, k_dir = jax.random.split(key, 3)

    # camera rays with a PIXEL-SIZED jitter (still coherent primaries, but
    # every variant is a genuinely different ray set)
    jit = jax.random.uniform(k_cam, (2,)) * (2.0 / res)
    o_p, d_p = scene.camera.generate_rays(res, res, jitter_ndc=jit)

    from evplp_tpu.trace.intersect import intersect_closest
    hit = intersect_closest(scene.tris, scene.bvh, o_p, d_p, t_min=1e-4,
                            tile_shape=(res, res))
    pts = o_p + hit.t[:, None] * d_p
    valid = hit.prim >= 0
    pts = jnp.where(valid[:, None], pts, jnp.asarray([2.0, 1.0, 2.0]))

    # shadow: from a random point near the top of the scene to each surface
    # point (the VPL position changes per variant)
    lp = jnp.asarray([2.0, 1.9, 2.0], jnp.float32) + \
        0.3 * jax.random.uniform(k_light, (3,))
    o_s = jnp.broadcast_to(lp, pts.shape)
    d_s = pts - lp

    # bounce: random hemisphere directions from the surface points
    u = jax.random.uniform(k_dir, (pts.shape[0], 2))
    z = u[:, 0]
    phi = 2 * jnp.pi * u[:, 1]
    r = jnp.sqrt(jnp.maximum(1 - z * z, 0.0))
    d_b = jnp.stack([r * jnp.cos(phi), z, r * jnp.sin(phi)], axis=-1)
    o_b = pts + 1e-3 * d_b

    perm = tile_perm(res)
    return {
        "primary": (o_p, d_p, False, 1e-4, 3.0e38),
        "primary_t": (o_p[perm], d_p[perm], False, 1e-4, 3.0e38),
        "shadow": (o_s, d_s, True, 1e-4, 1.0 - 1e-4),
        "shadow_t": (o_s[perm], d_s[perm], True, 1e-4, 1.0 - 1e-4),
        "bounce": (o_b, d_b, False, 1e-4, 3.0e38),
    }


def make_variants(scene, n_rays: int, reps: int, seed: int = 0):
    """reps+1 UNIQUE workload dicts (index 0 is the warmup)."""
    keys = jax.random.split(jax.random.PRNGKey(seed), reps + 1)
    out = [workload_variant(scene, n_rays, k) for k in keys]
    jax.block_until_ready(out)
    return out


def checksum(res):
    """Cheap output fingerprint: hit count + sum of t (device-side)."""
    t, prim = res[0], res[1]
    return (int(jnp.sum(prim >= 0)), float(jnp.sum(jnp.where(
        prim >= 0, jnp.nan_to_num(t, posinf=0.0), 0.0))))


def bench(fn, variants, name):
    """Times fn over per-rep unique inputs; returns median seconds.
    Verifies outputs differ across reps (cache detection)."""
    o, d, any_hit, tmin, tmax = variants[0][name]
    out = fn(o, d, tmin, tmax)
    jax.block_until_ready(out)

    times, sums = [], set()
    for v in variants[1:]:
        o, d, any_hit, tmin, tmax = v[name]
        t0 = time.perf_counter()
        out = fn(o, d, tmin, tmax)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
        sums.add(checksum(out))
    if len(sums) < max(2, len(times) // 2):
        print(f"  !! {name}: only {len(sums)} distinct outputs over "
              f"{len(times)} reps — CACHE SUSPECT", flush=True)
    return float(np.median(times)), times


def main():
    boxes = int(sys.argv[1]) if len(sys.argv) > 1 else 8500
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    scene = make_scene(boxes)
    variants = make_variants(scene, n_rays, reps)
    from evplp_tpu.trace.packet3 import packet3_trace
    bvh = scene.bvh

    for name in ("primary", "primary_t", "shadow", "shadow_t", "bounce"):
        any_hit = variants[0][name][2]

        def f(o, d, tmin, tmax, any_hit=any_hit):
            n = o.shape[0]
            return packet3_trace(
                bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds, bvh.pk_prim_map,
                o, d, jnp.full((n,), tmin, jnp.float32),
                jnp.full((n,), tmax, jnp.float32), any_hit=any_hit)

        dt, times = bench(f, variants, name)
        n = n_rays
        spread = (max(times) - min(times)) / dt * 100
        print(f"{name:10s} {n} rays: {dt*1e3:8.2f} ms  "
              f"{n/dt/1e6:8.2f} Mray/s  (spread {spread:.0f}%)", flush=True)


if __name__ == "__main__":
    main()
