"""Round-5 VSL sampling-half anatomy (follow-up to probe_r05_vsl.py):
the frame splits 8.5 lt / 474 occl (0.87x of the raw dense floor) /
~1172 ms sampling — so the only remaining lever is the SAMPLE half.

The kernel executes, per (record, 32x128-pixel block), s_needed =
max(gated adaptive counts) iterations over ALL 4096 lanes; lanes with
num < s ride along masked.  This probe measures

  * executed lane-steps  = sum over pairs of s_needed * block_size
    (for block rows 32 / 16 / 8 — would finer bounds help?)
  * useful lane-steps    = sum over gated pixels of num
  * kernel-only sampling time (precomputed gates; isolates the Pallas
    dispatches from ctx/occlusion), and the implied ns per executed
    lane-step vs the VPU ballpark (~8x128 f32 lanes/cycle @ 940 MHz,
    ~450 vector ops per 3-strategy sample step).

If executed/useful is small (<~1.5x) and ns/lane-step is at the VPU
floor, the <=1.0 s ask is flop-floor-bound and the bound gets recorded;
a large inflation names the restructure (finer blocks or per-record
pixel regrouping) worth its gather cost.

Usage: python tools/probe_r05_vsl2.py
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/evplp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from evplp_tpu.core import mathutil as mu  # noqa: E402
from evplp_tpu.core import rng  # noqa: E402
from evplp_tpu.core.sampling import iteration_key  # noqa: E402
from evplp_tpu.integrators.gbuffer import trace_gbuffer  # noqa: E402
from evplp_tpu.integrators.light_trace import trace_light_paths  # noqa: E402
from evplp_tpu.integrators import vsl as vslmod  # noqa: E402
from evplp_tpu.integrators import vsl_kernel  # noqa: E402
from evplp_tpu.scene.procedural import cornell_box  # noqa: E402

W, H, PATHS, BOUNCES, REPS = 1280, 720, 100, 3, 3


def main():
    scene = cornell_box()
    radius = jnp.float32(max(scene.bounding_radius * 0.05, 0.008))
    gbuf = trace_gbuffer(scene, W, H, None)
    jax.block_until_ready(gbuf.position)
    n = W * H

    pm = trace_light_paths(scene, iteration_key(2, 0), PATHS, BOUNCES + 1)
    records = vslmod._records_of(pm, PATHS)
    m = records["pos"].shape[0]
    g = vslmod.TRACE_GROUP
    pad = (-m) % g
    if pad:
        records = {k: jnp.concatenate(
            [v, jnp.zeros((pad,) + v.shape[1:], v.dtype)])
            for k, v in records.items()}
    mg = (m + pad) // g
    grouped = {k: v.reshape((mg, g) + v.shape[1:])
               for k, v in records.items()}

    @jax.jit
    def gates_of(recs):
        return vslmod._group_occlusion(
            scene, gbuf.position, gbuf.normal, gbuf.stencil, recs, (H, W))

    @jax.jit
    def num_of(recs):
        def one(rec_pos):
            return vslmod._num_samples_of(rec_pos, gbuf.position, radius)
        return jax.vmap(one)(recs["pos"])                    # (g, N)

    # ---- pass 1: inflation stats per block granularity ----
    MAXS = vslmod.MAX_VSL_SAMPLES
    useful = 0.0
    gated_px = 0
    executed = {32: 0.0, 16: 0.0, 8: 0.0}
    sneed_hist = np.zeros(MAXS + 1, np.int64)                # rows=32
    gates_np_groups = []
    nums_np_groups = []
    for gi in range(mg):
        recs = {k: v[gi] for k, v in grouped.items()}
        gate = np.asarray(gates_of(recs))                    # (g, N) bool
        num = np.asarray(num_of(recs))                       # (g, N) int32
        num = np.minimum(num, MAXS)
        gnum = np.where(gate, num, 0)
        useful += float(gnum.sum())
        gated_px += int(gate.sum())
        for rows in (32, 16, 8):
            bs = rows * 128
            blocks = gnum.reshape(g, n // bs, bs)
            sneed = blocks.max(axis=2)                       # (g, nb)
            executed[rows] += float(sneed.sum()) * bs
            if rows == 32:
                h, _ = np.histogram(sneed, bins=np.arange(MAXS + 2))
                sneed_hist += h
        gates_np_groups.append(gate)
        nums_np_groups.append(num)

    # ---- pass 2: kernel-only sampling time (precomputed gates) ----
    wi10 = mu.normalize(
        jnp.asarray(scene.camera.origin, jnp.float32)[None, :]
        - gbuf.position)
    pix = vsl_kernel.pack_pixels(gbuf.position, gbuf.normal, gbuf.kd,
                                 gbuf.ks, gbuf.ns, wi10)
    pixel_ids = jnp.arange(n, dtype=jnp.int32)
    pid_planes = pixel_ids.reshape(-1, 128)
    key = iteration_key(5, 0)
    seed0, seed1 = rng.seeds_from_key(key)
    vsl_inv_pi_r2 = mu.INV_PI / (radius * radius)
    flts = jnp.asarray([radius], jnp.float32)

    masks = []
    tables = []
    coshs = []
    cntss = []
    for gi in range(mg):
        recs = {k: v[gi] for k, v in grouped.items()}
        gate = jnp.asarray(gates_np_groups[gi])
        shifts = jnp.arange(g, dtype=jnp.int32)[:, None]
        mask = jnp.sum(gate.astype(jnp.int32) << shifts,
                       axis=0, dtype=jnp.int32)
        masks.append(mask.reshape(-1, 128))
        tables.append(vsl_kernel.pack_records(recs, vsl_inv_pi_r2))
        cosh, cnts = vsl_kernel.ctx_planes(gbuf.position, recs["pos"],
                                           radius)
        coshs.append(cosh)
        cntss.append(cnts)
    masks = jnp.stack(masks)
    tables = jnp.stack(tables)
    coshs = jnp.stack(coshs)
    cntss = jnp.stack(cntss)

    # Big arrays ride as jit ARGUMENTS (a closed-over stack of cosh
    # planes is ~2 GB of captured constants, which breaks the remote
    # compile transport).
    @jax.jit
    def sample_all(i, pix, pid_planes, masks, tables, coshs, cntss):
        def step(acc, xs):
            mask, table, cosh, cnts, base = xs
            ints = jnp.stack([seed0.astype(jnp.int32) + i * 0,
                              seed1.astype(jnp.int32), base])
            out = vsl_kernel.vsl_sample_group(
                pix, pid_planes, mask, cosh, cnts, table, ints, flts,
                group=g, rows=32)
            return acc + out, None
        bases = jnp.arange(mg, dtype=jnp.int32) * g
        acc0 = jnp.zeros((3, n // 128, 128), jnp.float32)
        acc, _ = jax.lax.scan(step, acc0, (masks, tables, coshs, cntss,
                                           bases))
        return acc

    out = sample_all(jnp.int32(0), pix, pid_planes, masks, tables,
                     coshs, cntss)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(REPS):
        out = sample_all(jnp.int32(1 + i), pix, pid_planes, masks,
                         tables, coshs, cntss)
    jax.block_until_ready(out)
    ms_kernel = (time.perf_counter() - t0) / REPS * 1000.0

    exec32 = executed[32]
    ns_per_step = ms_kernel * 1e6 / max(exec32, 1.0)
    # VPU ballpark: ~450 vector ops / sample step, 8x128 f32 lanes/cycle,
    # ~940 MHz -> ~0.47 ns per lane-step at pure-ALU speed of light
    sol_ns = 450 / (8 * 128) / 0.94

    cum = np.cumsum(sneed_hist * np.arange(MAXS + 1))
    out = {
        "protocol": f"cornell {W}x{H}, {PATHS} paths",
        "records": m, "pairs_r32": int(m * (n // (32 * 128))),
        "gated_px_frac": round(gated_px / (m * n), 4),
        "useful_lane_steps_g": round(useful / 1e9, 3),
        "executed_lane_steps_g": {
            str(r): round(executed[r] / 1e9, 3) for r in (32, 16, 8)},
        "inflation_x": {
            str(r): round(executed[r] / max(useful, 1.0), 2)
            for r in (32, 16, 8)},
        "sneed0_pair_frac_r32": round(
            float(sneed_hist[0]) / max(sneed_hist.sum(), 1), 4),
        "sneed_mean_r32": round(
            float((sneed_hist * np.arange(MAXS + 1)).sum()
                  / max(sneed_hist.sum(), 1)), 2),
        "kernel_only_ms": round(ms_kernel, 1),
        "ns_per_executed_lane_step": round(ns_per_step, 3),
        "vpu_alu_sol_ns_per_lane_step": round(sol_ns, 3),
        "headroom_x_vs_alu_sol": round(ns_per_step / sol_ns, 2),
    }
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
