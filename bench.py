"""Equal-protocol benchmark (BASELINE.md / SURVEY.md §6).

Headline metric: traced rays per second on the EVPLP ("ours") workload —
G-buffer primary rays + light-path rays + pixel x VPL shadow segments — at
reference-scale parameters (numVplLightPaths=30, numMaxBounces=3) on a
>=100k-triangle scene (box_field; the reference's conference is this scale
and its OBJs are git-LFS stubs).  Secondary: the same frame on the
62-triangle Cornell (round-1 headline), path-tracing throughput, and an
on-device differential check of the compiled Pallas kernel vs the dense
brute-force oracle.

North star (BASELINE.json): >= 100 Mrays/s/chip on TPU v5e.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""
from __future__ import annotations

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/evplp_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from evplp_tpu.core.sampling import iteration_key
from evplp_tpu.integrators.photon_fam import (
    PhotonFamConfig, init_state, photon_fam_frame)
from evplp_tpu.scene.procedural import box_field, cornell_box

# reference-protocol parameters (scene/*/*_ours.json; paths scaled to the
# procedural scenes, bounces identical)
RES = 1024
NUM_LIGHT_PATHS = 100_000
NUM_VPL_PATHS = 30
NUM_BOUNCES = 3
BIG_SCENE_BOXES = 8500          # ~102k triangles
BASELINE_MRAYS = 100.0          # north-star target, Mrays/s/chip


def evplp_rate(scene, frames_budget_s=30.0, max_frames=10):
    """Mray/s of the EVPLP frame on `scene` at reference parameters."""
    records = NUM_BOUNCES + 1
    cfg = PhotonFamConfig(
        width=RES, height=RES,
        num_light_paths=NUM_LIGHT_PATHS,
        num_vpl_light_paths=NUM_VPL_PATHS,
        num_records=records, mis_mode=1, accumulate=True, use_jitter=True,
        splat_tile=16, splat_cap=1 << 20, splat_span=2,
    )
    radius = scene.bounding_radius * 0.003
    pdf_mc = (NUM_VPL_PATHS / NUM_LIGHT_PATHS) / float(jnp.pi) / (radius * radius)
    clamp = 1.0 / scene.total_area

    state = init_state(cfg)

    def frame(state, i):
        return photon_fam_frame(
            scene, cfg, state, iteration_key(0, i),
            jnp.float32(radius), jnp.float32(clamp), jnp.float32(pdf_mc),
            jnp.float32(0.0))

    def real_sync(st):
        # the axon tunnel's block_until_ready can return before device work
        # completes; a host FETCH of a dependent scalar cannot
        np.asarray(jax.device_get(st.dropped))

    state = frame(state, 0)                      # compile
    real_sync(state)
    t0 = time.perf_counter()
    state = frame(state, 1)
    real_sync(state)
    per_frame = time.perf_counter() - t0
    frames = max(1, min(max_frames, int(frames_budget_s / max(per_frame, 1e-3))))

    t0 = time.perf_counter()
    for i in range(frames):
        state = frame(state, 2 + i)
    real_sync(state)
    elapsed = time.perf_counter() - t0

    n_px = RES * RES
    # UPPER-BOUND accounting (same convention as the reference's derived
    # ~110M/frame figure): counts every pixel x VPL pair even though the
    # pre-cull never traces backfacing/unusable pairs; the JSON also
    # reports a traced-rays-only companion via live_segment_fraction
    rays_per_frame = (
        n_px                                        # primary
        + NUM_LIGHT_PATHS * (records - 1)           # light-path bounces
        + n_px * NUM_VPL_PATHS * records            # VPL shadow segments
    )
    mrays = rays_per_frame * frames / elapsed / 1e6
    return mrays, elapsed / frames * 1000.0, frames, int(state.dropped)


def _closest_matches(hit, t_ref, p_ref):
    p_k = np.asarray(hit.prim)
    p_r = np.asarray(p_ref)
    hit_match = (p_k >= 0) == (p_r >= 0)
    m = (p_k >= 0) & (p_r >= 0)
    t_match = np.allclose(np.asarray(hit.t)[m], np.asarray(t_ref)[m],
                          rtol=1e-4)
    # differing prim ids with equal t are legitimate (coplanar duplicates)
    prim_match = (p_k[m] == p_r[m]) | np.isclose(
        np.asarray(hit.t)[m], np.asarray(t_ref)[m], rtol=1e-4)
    return bool(hit_match.all() and t_match and prim_match.all())


def kernel_check(scene, n_rays=8192):
    """Differential check of the COMPILED packet kernels (as Mosaic builds
    them on this device) vs the dense brute-force oracles, over the eight
    production ray paths: coherent closest-hit, shadow any-hit with
    pre-culled lanes (the ~90%-of-all-rays workload,
    lighttracing.cu:290-294), sorted-incoherent closest (PT bounces),
    rpl>1 multi-row leaves, fused node rows (the big-scene layout),
    the shared-sort closest+segment vertex dispatch, HBM-streamed tri
    rows, packed16 node rows, and the extract-mode meta path (the
    big-scene fallback; defaults auto-select SMEM meta at this node
    count).  Returns {path: "pass"|"fail"}."""
    from evplp_tpu.accel.bvh import build_bvh
    from evplp_tpu.trace.intersect import (_any_brute_chunked,
                                           _closest_brute_chunked,
                                           intersect_any, intersect_closest)
    checks = {}
    o, d = scene.camera.generate_rays(96, 96)   # 9216 coherent rays
    o, d = o[:n_rays], d[:n_rays]
    tmin = jnp.full((n_rays,), 1e-4, jnp.float32)
    tmax = jnp.full((n_rays,), 3.0e38, jnp.float32)

    # 1: coherent closest
    hit = intersect_closest(scene.tris, scene.bvh, o, d, t_min=1e-4)
    t_ref, p_ref, _, _ = jax.jit(_closest_brute_chunked)(
        scene.tris, o, d, tmin, tmax)
    checks["coherent_closest"] = _closest_matches(hit, t_ref, p_ref)

    # 2: any-hit shadow segments from surface points to a light point,
    # with ~25% of lanes pre-culled (empty interval, result unspecified)
    pts = np.asarray(o + np.asarray(hit.t)[:, None] * np.asarray(d))
    lp = np.asarray(scene.light.v0).reshape(-1, 3).mean(axis=0)
    o_s = jnp.asarray(np.broadcast_to(lp, pts.shape), jnp.float32)
    d_s = jnp.asarray(pts) - o_s
    live = jnp.asarray((np.arange(n_rays) % 4) != 0)
    seg_tmax = jnp.where(live, jnp.float32(1.0 - 1e-4), jnp.float32(0.0))
    occ = intersect_any(scene.tris, scene.bvh, o_s, d_s,
                        t_min=1e-4, t_max=seg_tmax)
    occ_ref = jax.jit(_any_brute_chunked)(
        scene.tris, o_s, d_s, tmin, jnp.full((n_rays,), 1.0 - 1e-4))
    lv = np.asarray(live)
    checks["anyhit_preculled"] = bool(
        (np.asarray(occ)[lv] == np.asarray(occ_ref)[lv]).all())

    # 3: sorted incoherent closest (the PT bounce path)
    rng = np.random.default_rng(11)
    z = rng.uniform(-1, 1, n_rays)
    phi = rng.uniform(0, 2 * np.pi, n_rays)
    r = np.sqrt(np.maximum(1 - z * z, 0))
    d_b = jnp.asarray(np.stack([r * np.cos(phi), z, r * np.sin(phi)],
                               axis=-1), jnp.float32)
    o_b = jnp.asarray(pts, jnp.float32) + 1e-3 * d_b
    hit_b = intersect_closest(scene.tris, scene.bvh, o_b, d_b,
                              t_min=1e-4, sort_rays=True)
    t_rb, p_rb, _, _ = jax.jit(_closest_brute_chunked)(
        scene.tris, o_b, d_b, tmin, tmax)
    checks["sorted_incoherent"] = _closest_matches(hit_b, t_rb, p_rb)

    # 4: rpl>1 (multi-row leaves) on a rebuilt BVH of the same geometry
    v0 = np.asarray(scene.tris.v0)
    v1 = v0 + np.asarray(scene.tris.e1)
    v2 = v0 + np.asarray(scene.tris.e2)
    real = np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1) > 0
    bvh16, perm16 = build_bvh(v0[real], v1[real], v2[real], leaf_size=16,
                              pack=True)
    from evplp_tpu.trace.intersect import Triangles
    pp = np.maximum(perm16, 0)
    e1p = (v1 - v0)[real][pp]
    e2p = (v2 - v0)[real][pp]
    nrm = np.cross(e1p, e2p)
    nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-20)
    tris16 = Triangles(
        v0=jnp.asarray(v0[real][pp]), e1=jnp.asarray(e1p),
        e2=jnp.asarray(e2p), n=jnp.asarray(nrm.astype(np.float32)))
    hit16 = intersect_closest(tris16, bvh16, o, d, t_min=1e-4)
    # the rebuild permutes triangle ids; compare hit mask + t only
    m16 = np.asarray(hit16.prim) >= 0
    checks["rpl2_closest"] = bool(
        (m16 == (np.asarray(p_ref) >= 0)).all()
        and np.allclose(np.asarray(hit16.t)[m16],
                        np.asarray(t_ref)[m16], rtol=1e-4))

    # 5: fused node rows (the >280k-triangle layout) on the same geometry
    bvhf, permf = build_bvh(v0[real], v1[real], v2[real], leaf_size=42,
                            pack=True, fused_nodes=True)
    ppf = np.maximum(permf, 0)
    e1f = (v1 - v0)[real][ppf]
    e2f = (v2 - v0)[real][ppf]
    nf = np.cross(e1f, e2f)
    nf /= np.maximum(np.linalg.norm(nf, axis=-1, keepdims=True), 1e-20)
    trisf = Triangles(v0=jnp.asarray(v0[real][ppf]), e1=jnp.asarray(e1f),
                      e2=jnp.asarray(e2f), n=jnp.asarray(nf.astype(np.float32)))
    hitf = intersect_closest(trisf, bvhf, o, d, t_min=1e-4)
    mf = np.asarray(hitf.prim) >= 0
    checks["fused_nodes_closest"] = bool(
        (mf == (np.asarray(p_ref) >= 0)).all()
        and np.allclose(np.asarray(hitf.t)[mf],
                        np.asarray(t_ref)[mf], rtol=1e-4))

    # 7: HBM-streamed triangle rows (the >1.6M layout: enqueue-time
    # per-slot DMA into VMEM staging) on the same fused geometry
    from evplp_tpu.trace import packet3 as p3mod
    cpu = jax.default_backend() == "cpu"      # smoke-test wiring only
    if cpu:
        p3mod.set_interpret(True)
    try:
        t_s, p_s, _, _ = p3mod.packet3_trace(
            bvhf.pk_tri_rows, bvhf.pk_meta, bvhf.pk_bounds,
            None if bvhf.slot_order else bvhf.pk_prim_map,
            o, d, 1e-4, 3.0e38, rpl=bvhf.rpl, fused=True, stream_tris=True)
    finally:
        if cpu:
            p3mod.set_interpret(False)
    ms = np.asarray(p_s) >= 0
    checks["streamed_tris_closest"] = bool(
        (ms == mf).all()
        and np.allclose(np.asarray(t_s)[ms], np.asarray(hitf.t)[ms],
                        rtol=1e-5))

    # 8: packed16 node rows (16 nodes per 128-lane row + pltpu.roll fetch,
    # the >3.2M layout) + streamed tri rows on the same geometry
    bvhp16, _p16 = build_bvh(v0[real], v1[real], v2[real], leaf_size=42,
                             pack=True, fused_nodes=True, packed_nodes=True)
    if cpu:
        p3mod.set_interpret(True)
    try:
        t_p, p_p, _, _ = p3mod.packet3_trace(
            bvhp16.pk_tri_rows, bvhp16.pk_meta, bvhp16.pk_bounds,
            None if bvhp16.slot_order else bvhp16.pk_prim_map,
            o, d, 1e-4, 3.0e38, rpl=bvhp16.rpl, fused=True,
            stream_tris=True, packed16=True)
    finally:
        if cpu:
            p3mod.set_interpret(False)
    mp = np.asarray(p_p) >= 0
    checks["packed16_streamed_closest"] = bool(
        (mp == mf).all()
        and np.allclose(np.asarray(t_p)[mp], np.asarray(hitf.t)[mp],
                        rtol=1e-5))

    # 9: extract-mode meta (smem_meta=False — the big-scene path where the
    # node count exceeds the SMEM budget and meta words come from vector
    # extracts) on the fused geometry vs the same oracle; the default
    # paths above all auto-select SMEM meta at this node count
    if cpu:
        p3mod.set_interpret(True)
    try:
        t_x, p_x, _, _ = p3mod.packet3_trace(
            bvhf.pk_tri_rows, bvhf.pk_meta, bvhf.pk_bounds,
            None if bvhf.slot_order else bvhf.pk_prim_map,
            o, d, 1e-4, 3.0e38, rpl=bvhf.rpl, fused=True, smem_meta=False)
    finally:
        if cpu:
            p3mod.set_interpret(False)
    mx = np.asarray(p_x) >= 0
    checks["extract_meta_closest"] = bool(
        (mx == mf).all()
        and np.allclose(np.asarray(t_x)[mx], np.asarray(hitf.t)[mx],
                        rtol=1e-5))

    # 6: shared-sort NEE+extension trace (PT's per-vertex dispatch):
    # closest along the bounce dirs + any-hit segments to the light point,
    # shared origins + one shared permutation, ~25% of segments pre-culled
    from evplp_tpu.trace.intersect import closest_and_segment
    seg_to = jnp.asarray(np.broadcast_to(lp, pts.shape), jnp.float32)
    hit_p, occ_p = closest_and_segment(
        scene.tris, scene.bvh, o_b, d_b, t_min=1e-4, t_max=3.0e38,
        seg_to=seg_to, seg_eps=1e-4, seg_live=live)
    occ_pref = jax.jit(_any_brute_chunked)(
        scene.tris, o_b, seg_to - o_b, tmin,
        jnp.full((n_rays,), 1.0 - 1e-4))
    checks["pair_closest_segment"] = bool(
        _closest_matches(hit_p, t_rb, p_rb)
        and (np.asarray(occ_p)[lv] == np.asarray(occ_pref)[lv]).all())

    return {k: ("pass" if v else "fail") for k, v in checks.items()}


def control_shadow_ms(scene, reps: int = 6):
    """Pinned drift-control workload (VERDICT r3 "do this" #3): a fixed-seed
    1M-segment coherent shadow trace through the production packet kernel.

    The tunnel/device drifts 2.3-2.6x between windows, localized to the
    Pallas kernel path (NOTES.md "Tunnel drift LOCALIZED") — absolute
    headline numbers are not comparable across rounds without a control.
    This workload is pinned (same scene, same seed, same shapes forever);
    BENCH reports it alongside the headline so any reader can normalize:
    normalized = value * (control_ms / CONTROL_REF_MS).

    Timing obeys the NOTES measurement rules: each rep's input depends on
    the previous rep's OUTPUT (defeats the tunnel's result cache) and on
    the rep index; one compile, one end fence, divide.
    """
    from evplp_tpu.trace.intersect import intersect_any

    side = 1024
    n = side * side
    # raster-ordered target grid on a mid-scene plane, one shared
    # light-point origin: the vpl_gather shape (record-major segments to
    # screen-tile targets — spatially adjacent rays share packets)
    lo = np.asarray(scene.bvh.node_min[0])
    hi = np.asarray(scene.bvh.node_max[0])
    gx, gz = np.meshgrid(np.linspace(0.05, 0.95, side, dtype=np.float32),
                         np.linspace(0.05, 0.95, side, dtype=np.float32),
                         indexing="ij")
    pts = np.stack([lo[0] + gx * (hi[0] - lo[0]),
                    np.full_like(gx, lo[1] + 0.3 * (hi[1] - lo[1])),
                    lo[2] + gz * (hi[2] - lo[2])], axis=-1).reshape(-1, 3)
    lp = np.asarray(scene.light.v0).reshape(-1, 3).mean(axis=0)
    o = jnp.asarray(np.broadcast_to(lp, pts.shape).astype(np.float32))
    d = jnp.asarray(pts) - o

    @jax.jit
    def step(carry):
        prev, i = carry
        # rep-dependent + output-dependent origin jitter: inputs differ
        # every rep and chain through device results
        off = (jnp.float32(1e-6) * i
               + jnp.float32(1e-9) * prev.sum().astype(jnp.float32))
        occ = intersect_any(scene.tris, scene.bvh, o + off, d,
                            t_min=1e-4, t_max=1.0 - 1e-4,
                            tile_shape=(side, side))
        return occ.astype(jnp.float32), i + jnp.float32(1.0)

    carry = (jnp.zeros((n,), jnp.float32), jnp.float32(0.0))
    carry = step(carry)                          # compile + warm
    np.asarray(jax.device_get(carry[0][0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        carry = step(carry)
    np.asarray(jax.device_get(carry[0][0]))      # completion fence
    elapsed = time.perf_counter() - t0
    return elapsed / reps * 1000.0               # ms per 1M segments


# Pinned reference value for the control workload (ms per 1M segments),
# measured 10.67/10.82/10.83 in the round-4 build session (2026-08-19,
# fast window) on TPU v5e.  NEVER update this constant without renaming
# the metric: cross-round normalization depends on it staying fixed.
CONTROL_REF_MS = 10.8


def control_pt_ms(scene, reps: int = 4):
    """Pinned PT-FRAME drift control (VERDICT r4 #6): 256^2, 3 bounces,
    fixed key sequence, on the 102k-tri headline scene.  The shadow-kernel
    control does not track the PT/VSL frame regimes (they drift
    independently — NOTES round-4 bench preview), so frame-level absolutes
    get their own pinned control.  Chained accumulation defeats the
    tunnel's result cache; one compile, one end fence."""
    from evplp_tpu.integrators.gbuffer import trace_gbuffer
    from evplp_tpu.integrators.pt import render_pt_frame

    side = 256

    @jax.jit
    def step(acc, key):
        gbuf = trace_gbuffer(scene, side, side, None)
        return acc + render_pt_frame(scene, gbuf, key, NUM_BOUNCES,
                                     tile_shape=(side, side))

    acc = jnp.zeros((side * side, 3), jnp.float32)
    acc = step(acc, iteration_key(9, 0))
    np.asarray(jax.device_get(acc[0]))
    t0 = time.perf_counter()
    for i in range(reps):
        acc = step(acc, iteration_key(9, 1 + i))
    np.asarray(jax.device_get(acc[0]))
    return (time.perf_counter() - t0) / reps * 1000.0


# Pinned reference for the PT-frame control (ms/frame), measured in the
# round-5 build session on TPU v5e.  Same rule as CONTROL_REF_MS: never
# update without renaming the metric.
CONTROL_PT_REF_MS = 47.0


def live_segment_fraction(scene):
    """Fraction of pixel x VPL shadow segments that are actually traced
    (the pre-cull skips backfacing/unusable/sky pairs, vpl.py:52-64).
    Used to report a traced-rays-only companion to the headline metric,
    whose ray count — like the reference's derived 110M/frame figure —
    counts every pair."""
    from evplp_tpu.core import mathutil as mu
    from evplp_tpu.integrators.gbuffer import trace_gbuffer
    from evplp_tpu.integrators.light_trace import (FLAG_VPL,
                                                   trace_light_paths)

    @jax.jit
    def frac():
        gbuf = trace_gbuffer(scene, RES, RES, None)
        pm = trace_light_paths(scene, iteration_key(2, 0), NUM_LIGHT_PATHS,
                               NUM_BOUNCES + 1)
        flat = pm.slice_paths(NUM_VPL_PATHS).flat()
        v12 = flat.pos[None, :, :] - gbuf.position[:, None, :]
        ucos1 = jnp.maximum(jnp.sum(gbuf.normal[:, None, :] * v12, -1), 0.0)
        ucos2 = jnp.maximum(-jnp.sum(flat.normal[None, :, :] * v12, -1), 0.0)
        pre = ((ucos1 * ucos2) > 0.0) \
            & (gbuf.stencil > 0.0)[:, None] \
            & (((flat.flags & FLAG_VPL) != 0))[None, :]
        return jnp.mean(pre.astype(jnp.float32))

    return float(frac())


def main():
    big = box_field(num_boxes=BIG_SCENE_BOXES)
    # slot-ordered scenes pad triangles to the packet layout; report the
    # REAL triangle count (padding rows are degenerate and never hit)
    n_tris = int((big.bvh.pk_prim_map >= 0).sum()) \
        if big.bvh.slot_order else int(big.tris.v0.shape[0])
    check = kernel_check(big)
    live_frac = live_segment_fraction(big)
    ctrl_ms = control_shadow_ms(big)
    ctrl_pt_ms = control_pt_ms(big)

    mrays_big, ms_big, frames_big, dropped_big = evplp_rate(big)

    small = cornell_box()
    mrays_small, ms_small, frames_small, dropped_small = evplp_rate(small)

    # at-capacity rows (settle the round-2 295k measurement artifact and
    # prove the 1M-triangle ceiling): constant box density via
    # room_scale = sqrt(n/8500); both use the fused-node + 42-leaf layout
    def capacity_row(boxes, budget):
        sc = box_field(num_boxes=boxes,
                       room_scale=float(np.sqrt(boxes / 8500.0)))
        tris = int((sc.bvh.pk_prim_map >= 0).sum()) \
            if sc.bvh.slot_order else int(sc.tris.v0.shape[0])
        mr, ms, _, _ = evplp_rate(sc, frames_budget_s=budget, max_frames=3)
        return tris, mr, ms

    cap_tris, mrays_cap, ms_cap = capacity_row(24500, 15.0)    # ~295k
    cap1m_tris, mrays_1m, ms_1m = capacity_row(85000, 15.0)    # ~1.02M
    # ~2.4M: past the fused-resident ceiling -> HBM-streamed tri rows
    try:
        cap2m_tris, mrays_2m, ms_2m = capacity_row(200000, 15.0)
    except Exception as e:                      # pragma: no cover
        cap2m_tris, mrays_2m, ms_2m = -1, 0.0, 0.0
        print(f"# streamed capacity row failed: {e!r}", flush=True)
    # ~6M: past STREAM_CAP -> packed16 node rows + streamed tri rows is
    # the only packet path (VERDICT r3 #5; reference bar: Trbvh over
    # arbitrary scene sizes, rtcomphoton.h:705-707)
    try:
        t6 = time.perf_counter()
        cap6m_tris, mrays_6m, ms_6m = capacity_row(500000, 30.0)
        build6_s = time.perf_counter() - t6
    except Exception as e:                      # pragma: no cover
        cap6m_tris, mrays_6m, ms_6m, build6_s = -1, 0.0, 0.0, 0.0
        print(f"# packed16 capacity row failed: {e!r}", flush=True)

    # path-tracing throughput on the big scene (1 primary + per-bounce
    # extension + NEE shadow segment per pixel — upper-bound ray count)
    from evplp_tpu.integrators.gbuffer import trace_gbuffer
    from evplp_tpu.integrators.pt import render_pt_frame

    # protocol resolution (1280x720 — BASELINE.md; round 4 measured 1024^2,
    # a needless 12%-pixel divergence from the number being chased)
    PT_W, PT_H = 1280, 720

    @jax.jit
    def pt_frame(acc, key):
        gbuf = trace_gbuffer(big, PT_W, PT_H, None)
        return acc + render_pt_frame(big, gbuf, key, NUM_BOUNCES,
                                     tile_shape=(PT_H, PT_W))

    n_px = PT_W * PT_H
    acc = jnp.zeros((n_px, 3), jnp.float32)
    acc = pt_frame(acc, iteration_key(1, 0))
    np.asarray(jax.device_get(acc[0]))
    t0 = time.perf_counter()
    pt_frames = 10
    for i in range(pt_frames):
        acc = pt_frame(acc, iteration_key(1, 1 + i))
    np.asarray(jax.device_get(acc[0]))          # real completion fence
    pt_elapsed = time.perf_counter() - t0
    pt_rays = n_px * (1 + NUM_BOUNCES * 2)
    pt_mrays = pt_rays * pt_frames / pt_elapsed / 1e6

    # VSL protocol frame (cornell_vsl.json scale: 1280x720, 100 paths,
    # vslRadiusPercentage=0.05) — the VERDICT round-2 target is <= 3 s
    from evplp_tpu.integrators.light_trace import trace_light_paths
    from evplp_tpu.integrators.vsl import vsl_gather
    VSL_W, VSL_H, VSL_PATHS = 1280, 720, 100
    vsl_radius = jnp.float32(max(small.bounding_radius * 0.05, 0.008))
    vsl_gbuf = trace_gbuffer(small, VSL_W, VSL_H, None)
    jax.block_until_ready(vsl_gbuf.position)

    def vsl_frame(i):
        pm = trace_light_paths(small, iteration_key(2, i), VSL_PATHS,
                               NUM_BOUNCES + 1)
        return vsl_gather(small, vsl_gbuf, pm, iteration_key(5, i),
                          vsl_radius, VSL_PATHS,
                          tile_shape=(VSL_H, VSL_W))

    vacc = vsl_frame(0)
    np.asarray(jax.device_get(vacc.ravel()[0]))
    t0 = time.perf_counter()
    vsl_frames = 2
    for i in range(vsl_frames):
        vacc = vacc + vsl_frame(1 + i)
    np.asarray(jax.device_get(vacc.ravel()[0]))
    vsl_ms = (time.perf_counter() - t0) / vsl_frames * 1000.0

    print(json.dumps({
        "metric": "evplp_100k_mrays_per_sec",
        "value": round(mrays_big, 2),
        "unit": "Mray/s",
        "vs_baseline": round(mrays_big / BASELINE_MRAYS, 3),
        # pinned drift control: same workload forever; normalize headlines
        # across rounds as value * control_ms / control_ref_ms
        "control_shadow_ms_per_mseg": round(ctrl_ms, 2),
        "control_ref_ms_per_mseg": CONTROL_REF_MS,
        "normalized_mrays_per_sec": round(
            mrays_big * ctrl_ms / CONTROL_REF_MS, 2),
        "scene_tris": n_tris,
        "frames": frames_big,
        "ms_per_frame": round(ms_big, 1),
        "resolution": RES,
        "device": str(jax.devices()[0]),
        "kernel_check": check,
        "dropped_splat_pairs": dropped_big,
        "rays_accounting": "upper_bound (every pixel x VPL pair counted; "
                           "pre-culled pairs are never traced)",
        "live_segment_fraction": round(live_frac, 4),
        "traced_mrays_per_sec": round(mrays_big * (
            (RES * RES + NUM_LIGHT_PATHS * NUM_BOUNCES
             + RES * RES * NUM_VPL_PATHS * (NUM_BOUNCES + 1) * live_frac)
            / (RES * RES + NUM_LIGHT_PATHS * NUM_BOUNCES
               + RES * RES * NUM_VPL_PATHS * (NUM_BOUNCES + 1))), 2),
        "cornell_mrays_per_sec": round(mrays_small, 2),
        "cornell_ms_per_frame": round(ms_small, 1),
        "capacity_scene_tris": cap_tris,
        "capacity_mrays_per_sec": round(mrays_cap, 2),
        "capacity_ms_per_frame": round(ms_cap, 1),
        "capacity_1m_scene_tris": cap1m_tris,
        "capacity_1m_mrays_per_sec": round(mrays_1m, 2),
        "capacity_1m_ms_per_frame": round(ms_1m, 1),
        "capacity_2m_scene_tris": cap2m_tris,
        "capacity_2m_mrays_per_sec": round(mrays_2m, 2),
        "capacity_2m_ms_per_frame": round(ms_2m, 1),
        "capacity_6m_scene_tris": cap6m_tris,
        "capacity_6m_mrays_per_sec": round(mrays_6m, 2),
        "capacity_6m_ms_per_frame": round(ms_6m, 1),
        "capacity_6m_build_plus_frame_s": round(build6_s, 1),
        "pt_mrays_per_sec": round(pt_mrays, 2),
        "pt_ms_per_frame": round(pt_elapsed / pt_frames * 1000.0, 1),
        "pt_resolution": f"{PT_W}x{PT_H}",
        "vsl_ms_per_frame": round(vsl_ms, 1),
        "vsl_protocol": "1280x720, 100 paths, r%=0.05 (cornell_vsl.json)",
        # frame-level drift control (VERDICT r4 #6): the PT/VSL frame
        # regime drifts independently of the shadow kernel; normalize
        # frame times as ms * CONTROL_PT_REF_MS / control_pt_ms
        "control_pt_ms_per_frame": round(ctrl_pt_ms, 2),
        "control_pt_ref_ms_per_frame": CONTROL_PT_REF_MS,
        "normalized_pt_ms_per_frame": round(
            pt_elapsed / pt_frames * 1000.0 * CONTROL_PT_REF_MS
            / ctrl_pt_ms, 1),
        "normalized_vsl_ms_per_frame": round(
            vsl_ms * CONTROL_PT_REF_MS / ctrl_pt_ms, 1),
    }))


if __name__ == "__main__":
    main()
