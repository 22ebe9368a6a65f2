"""packet5 big-packet sweep on TPU (tile size matched to packet size)."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from tools.bench_trace import make_scene, workloads, bench  # noqa: E402


def tile_perm(res, th, tw):
    idx = np.arange(res * res).reshape(res, res)
    idx = idx.reshape(res // th, th, res // tw, tw)
    return jnp.asarray(idx.transpose(0, 2, 1, 3).reshape(-1))


def main():
    boxes = int(sys.argv[1]) if len(sys.argv) > 1 else 8500
    scene = make_scene(boxes)
    res = 1024
    wl = workloads(scene, res * res, jax.random.PRNGKey(0))
    from evplp_tpu.trace.packet5 import packet5_trace
    bvh = scene.bvh

    for rows, npack in ((64, 2), (128, 1), (128, 2), (256, 1)):
        perm = tile_perm(res, min(rows, res), 128)
        print(f"--- rows={rows} npack={npack} (tile {rows}x128)", flush=True)
        for name in ("primary", "shadow"):
            o, d, any_hit, tmin, tmax = wl[name]
            o, d = o[perm], d[perm]
            n = o.shape[0]
            args = []
            for j in range(2):
                args.append((bvh.pk_tri_rows, bvh.pk_fb, bvh.pk_fm,
                             bvh.pk_prim_map, o, d * (1.0 + 1e-6 * j),
                             jnp.full((n,), tmin, jnp.float32),
                             jnp.full((n,), tmax, jnp.float32)))
            f = lambda *a: packet5_trace(*a, any_hit=any_hit, rows=rows,
                                         npack=npack)
            try:
                dt = bench(f, args, 3)
            except Exception as e:
                print(f"{name}: FAILED {type(e).__name__}: {e}"[:200],
                      flush=True)
                continue
            print(f"{name}_t {n} rays: {dt*1e3:8.2f} ms  "
                  f"{n/dt/1e6:8.2f} Mray/s", flush=True)


if __name__ == "__main__":
    main()
