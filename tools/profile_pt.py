"""PT frame cost attribution at bench scale (102k tris, 1024^2).

Times render_pt_frame at num_bounces = 0..3 with chained accumulation +
fetch fences (frame-level timing — the only trustworthy kind on the
tunnel).  Marginal diffs attribute cost per bounce; bounces are identical
in structure so the marginal cost is the (sorted closest + sorted NEE +
shading + estimator) bundle.

Usage: python tools/profile_pt.py [boxes] [res] [frames]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from evplp_tpu.core.sampling import iteration_key            # noqa: E402
from evplp_tpu.integrators.gbuffer import trace_gbuffer      # noqa: E402
from evplp_tpu.integrators.pt import render_pt_frame         # noqa: E402
from evplp_tpu.scene.procedural import box_field             # noqa: E402


def timed(fn, acc, frames, seed):
    acc = fn(acc, iteration_key(seed, 0))
    np.asarray(jax.device_get(acc[0]))
    t0 = time.perf_counter()
    for i in range(frames):
        acc = fn(acc, iteration_key(seed, 1 + i))
    np.asarray(jax.device_get(acc[0]))
    return (time.perf_counter() - t0) / frames * 1000.0


def main():
    boxes = int(sys.argv[1]) if len(sys.argv) > 1 else 8500
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    scene = box_field(num_boxes=boxes)
    n_px = res * res
    acc0 = jnp.zeros((n_px, 3), jnp.float32)

    @jax.jit
    def f_gbuf(acc, key):
        g = trace_gbuffer(scene, res, res, None)
        return acc + g.position

    ms_g = timed(f_gbuf, acc0, frames, 7)
    print(f"gbuffer only:        {ms_g:8.1f} ms", flush=True)

    prev = None
    for nb in (0, 1, 2, 3):
        @jax.jit
        def f(acc, key, nb=nb):
            g = trace_gbuffer(scene, res, res, None)
            return acc + render_pt_frame(scene, g, key, nb,
                                         tile_shape=(res, res))
        ms = timed(f, acc0, frames, 10 + nb)
        marg = "" if prev is None else f"   (+{ms - prev:6.1f} ms marginal)"
        print(f"gbuffer+pt nb={nb}:    {ms:8.1f} ms{marg}", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
