"""Leaf-size sweep at FAT leaves — the two-level traversal hypothesis.

Round-3's flat table varied leaf 8/16/32 (rpl 1-3): parity.  This sweeps
to 112/224/448-triangle leaves (rpl 8/16/32, rolled row loop in the
drain), where the tree collapses to a few hundred nodes and the kernel
becomes "walk a tiny top tree, dense-test fat clusters".  If iterations
are the cost and drain rows are cheap, incoherent workloads should move.

Per NOTES.md measurement rules: fresh RNG inputs per rep, per-rep fetch
fences, medians, checksum cross-validation.  Ray sets are IDENTICAL
across leaf configs (variants generated once); the t-checksum must agree
across configs (prim ids are slot-space and may differ).

Usage: python tools/bench_leaf.py [boxes] [rays] [reps]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tools.bench_trace import make_scene, make_variants  # noqa: E402
from evplp_tpu.accel.bvh import build_bvh                # noqa: E402
from evplp_tpu.trace.intersect import (                  # noqa: E402
    Triangles, intersect_closest, intersect_any)


def rebuild(scene, leaf_size: int):
    """Rebuild the scene's BVH (+ slot-ordered Triangles) at leaf_size."""
    v0 = np.asarray(scene.tris.v0)
    e1 = np.asarray(scene.tris.e1)
    e2 = np.asarray(scene.tris.e2)
    # strip the padded slot rows (degenerate) before re-building
    keep = np.linalg.norm(np.cross(e1, e2), axis=-1) > 0
    v0, v1, v2 = v0[keep], (v0 + e1)[keep], (v0 + e2)[keep]
    bvh, order = build_bvh(v0, v1, v2, slot_order=True,
                           leaf_size=leaf_size, fused_nodes=False)
    valid = order >= 0
    oi = np.maximum(order, 0)

    def take(x):
        y = np.array(x[oi])
        y[~valid] = 0.0
        return jnp.asarray(y)

    nv0, nv1, nv2 = take(v0), take(v1), take(v2)
    e1o, e2o = nv1 - nv0, nv2 - nv0
    n = np.cross(np.asarray(e1o), np.asarray(e2o))
    n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    tris = Triangles(v0=nv0, e1=e1o, e2=e2o,
                     n=jnp.asarray(n.astype(np.float32)))
    return tris, bvh


def run_config(tris, bvh, variants, n_rays):
    res = int(np.sqrt(n_rays))
    cases = {
        "primary_t": ("primary", False, dict(tile_shape=(res, res))),
        "shadow_t": ("shadow", True, dict(tile_shape=(res, res))),
        "bounce_s": ("bounce", False, dict(sort_rays=True)),
        "nee_s": ("shadow", True, dict(sort_rays=True)),
    }
    out = {}
    for label, (src, any_hit, kw) in cases.items():
        def f(o, d, tmin, tmax, any_hit=any_hit, kw=kw):
            if any_hit:
                occ = intersect_any(tris, bvh, o, d, t_min=tmin,
                                    t_max=tmax, **kw)
                return jnp.sum(occ.astype(jnp.int32))
            h = intersect_closest(tris, bvh, o, d, t_min=tmin,
                                  t_max=tmax, **kw)
            return jnp.sum(jnp.where(h.prim >= 0,
                                     jnp.nan_to_num(h.t, posinf=0.0), 0.0))

        o, d, _, tmin, tmax = variants[0][src]
        warm = f(o, d, tmin, tmax)
        jax.block_until_ready(warm)
        out[label + "_ck"] = float(warm)

        times, sums = [], set()
        for v in variants[1:]:
            o, d, _, tmin, tmax = v[src]
            t0 = time.perf_counter()
            r = f(o, d, tmin, tmax)
            jax.block_until_ready(r)
            times.append(time.perf_counter() - t0)
            sums.add(float(r))
        dt = float(np.median(times))
        flag = "  CACHE SUSPECT" if len(sums) < max(2, len(times) // 2) else ""
        spread = (max(times) - min(times)) / dt * 100
        print(f"  {label:10s} {dt*1e3:8.2f} ms  {n_rays/dt/1e6:8.2f} Mray/s"
              f"  (spread {spread:.0f}%){flag}", flush=True)
        out[label] = dt
    return out


def main():
    boxes = int(sys.argv[1]) if len(sys.argv) > 1 else 8500
    n_rays = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    leaves = ([int(x) for x in sys.argv[4].split(",")]
              if len(sys.argv) > 4 else [14, 42, 112, 224, 448])

    scene = make_scene(boxes)
    variants = make_variants(scene, n_rays, reps)

    results = {}
    checks = {}
    for leaf in leaves:
        tris, bvh = rebuild(scene, leaf)
        n_nodes = bvh.node_min.shape[0]
        n_rows = bvh.pk_tri_rows.shape[0]
        print(f"leaf {leaf:4d}: {n_nodes} nodes, {n_rows} tri rows "
              f"({n_rows * 128 * 4 / 1e6:.1f} MB rows)", flush=True)
        results[leaf] = run_config(tris, bvh, variants, n_rays)
        checks[leaf] = {k: v for k, v in results[leaf].items()
                        if k.endswith("_ck")}

    base = leaves[0]
    for leaf in leaves[1:]:
        for k, v in checks[leaf].items():
            b = checks[base][k]
            if not np.isclose(v, b, rtol=1e-3):
                print(f"!! checksum mismatch leaf {leaf} {k}: "
                      f"{v} vs {b}", flush=True)

    print("\nspeedup vs leaf", base)
    for leaf in leaves[1:]:
        row = "  ".join(
            f"{k}: {results[base][k] / results[leaf][k]:.2f}x"
            for k in ("primary_t", "shadow_t", "bounce_s", "nee_s"))
        print(f"  leaf {leaf:4d}  {row}", flush=True)


if __name__ == "__main__":
    main()
