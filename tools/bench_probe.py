"""Perf-archaeology probes for packet3 (WRONG results, timing only)."""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from tools.bench_trace import make_scene, workloads, bench  # noqa: E402
from evplp_tpu.trace import packet3  # noqa: E402

probe = sys.argv[1]  # none | nodrain | halfslab
if probe == "nodrain":
    packet3._PROBE_SKIP_DRAIN = True
elif probe == "halfslab":
    packet3._PROBE_HALF_SLAB = True

scene = make_scene(8500)
wl = workloads(scene, 1 << 20, jax.random.PRNGKey(0))
bvh = scene.bvh
for name in ("primary_t", "shadow_t"):
    o, d, any_hit, tmin, tmax = wl[name]
    n = o.shape[0]
    args = []
    for j in range(2):
        args.append((bvh.pk_tri_rows, bvh.pk_meta, bvh.pk_bounds,
                     bvh.pk_prim_map, o, d * (1.0 + 1e-6 * j),
                     jnp.full((n,), tmin, jnp.float32),
                     jnp.full((n,), tmax, jnp.float32)))
    f = lambda *a: packet3.packet3_trace(*a, any_hit=any_hit, rows=64,
                                         npack=1)
    dt = bench(f, args, 3)
    print(f"{probe} {name}: {dt*1e3:.2f} ms  {n/dt/1e6:.2f} Mray/s",
          flush=True)
