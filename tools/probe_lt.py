"""Bisect light_trace's frame cost at 102k tris: full pass vs trace-only vs
everything-but-trace.  Pipelined timing, fresh keys per rep.

Usage: python tools/probe_lt.py [boxes] [paths]
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from evplp_tpu.core.sampling import iteration_key  # noqa: E402
from evplp_tpu.integrators import light_trace as lt  # noqa: E402
from evplp_tpu.scene.procedural import box_field  # noqa: E402
from evplp_tpu.trace.intersect import intersect_closest  # noqa: E402


def main():
    boxes = int(sys.argv[1]) if len(sys.argv) > 1 else 8500
    paths = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    scene = box_field(num_boxes=boxes)
    R = 5
    seed = int.from_bytes(os.urandom(2), "little")
    keys = [iteration_key(seed, i) for i in range(R + 1)]

    full = jax.jit(lambda k: lt.trace_light_paths(scene, k, paths, 4))

    @jax.jit
    def trace_only(k):
        """The pass's 3 incoherent-bounce traces, nothing else."""
        p = paths
        u = jax.random.uniform(k, (p, 5))
        pos = scene.tris.v0[0] + 0.0 * u[:, :3]
        # emitter sample start, then 3 chained traces with evolving dirs
        from evplp_tpu.core.light import light_sample
        pos, n0, _, _ = light_sample(scene.light, u[:, :3])
        z = u[:, 3]
        phi = 2 * jnp.pi * u[:, 4]
        r = jnp.sqrt(jnp.maximum(1 - z * z, 0.0))
        d = jnp.stack([r * jnp.cos(phi), -z, r * jnp.sin(phi)], axis=-1)
        acc = jnp.zeros((p,))
        for b in range(3):
            hit = intersect_closest(scene.tris, scene.bvh, pos, d,
                                    t_min=1e-4)
            pos = pos + hit.t[:, None] * d
            # new pseudo-random dir from hit params (cheap, traceable)
            d = jnp.stack([jnp.cos(hit.u * 37 + b), jnp.sin(hit.v * 57),
                           jnp.cos(hit.u + hit.v)], axis=-1)
            acc = acc + hit.t
        return acc

    @jax.jit
    def no_trace(k):
        """Full pass with intersect_closest stubbed to fake hits."""
        import evplp_tpu.integrators.light_trace as ltm
        from evplp_tpu.trace.intersect import Hit
        real = ltm.intersect_closest
        p = paths

        def fake(tris, bvh, o, dvec, t_min=0.0, t_max=0.0, **kw):
            n = o.shape[0]
            lane = jnp.arange(n, dtype=jnp.int32) % tris.v0.shape[0]
            return Hit(t=jnp.full((n,), 0.5), prim=lane,
                       u=jnp.full((n,), 0.3), v=jnp.full((n,), 0.3))
        ltm.intersect_closest = fake
        try:
            out = lt.trace_light_paths(scene, k, paths, 4)
        finally:
            ltm.intersect_closest = real
        return out

    for name, fn in (("full      ", full), ("trace_only", trace_only),
                     ("no_trace  ", no_trace)):
        jax.block_until_ready(fn(keys[0]))
        t0 = time.perf_counter()
        outs = [fn(k) for k in keys[1:]]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / R
        print(f"{name}: {dt*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
