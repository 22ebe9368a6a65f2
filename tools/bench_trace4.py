"""packet4 sweep on TPU. Usage: python tools/bench_trace4.py [boxes]"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from tools.bench_trace import make_scene, workloads, bench  # noqa: E402


def main():
    boxes = int(sys.argv[1]) if len(sys.argv) > 1 else 8500
    scene = make_scene(boxes)
    wl = workloads(scene, 1 << 20, jax.random.PRNGKey(0))
    from evplp_tpu.trace.packet4 import packet4_trace
    bvh = scene.bvh

    for rows, npack in ((64, 1), (64, 2), (32, 2), (128, 1)):
        print(f"--- rows={rows} npack={npack}", flush=True)
        for name, (o, d, any_hit, tmin, tmax) in wl.items():
            n = o.shape[0]
            args = []
            for j in range(2):
                args.append((bvh.pk_tri_rows, bvh.pk4_bounds, bvh.pk4_meta,
                             bvh.pk_prim_map, o, d * (1.0 + 1e-6 * j),
                             jnp.full((n,), tmin, jnp.float32),
                             jnp.full((n,), tmax, jnp.float32)))
            f = lambda *a: packet4_trace(*a, any_hit=any_hit, rows=rows,
                                         npack=npack)
            try:
                dt = bench(f, args, 3)
            except Exception as e:
                print(f"{name}: FAILED {type(e).__name__}: {e}"[:200],
                      flush=True)
                continue
            print(f"{name:10s} {n} rays: {dt*1e3:8.2f} ms  "
                  f"{n/dt/1e6:8.2f} Mray/s", flush=True)


if __name__ == "__main__":
    main()
